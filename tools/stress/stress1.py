"""Randomized differential stress: all score/trace backends vs scalar oracles.

Env:
  STRESS_TRIALS   number of random trials (default 200)
  STRESS_XDROP    0 = plain banded DP; >0 = chunk-granular X-drop semantics
  STRESS_PALLAS   1 = include pallas interpret backend (slow), default 1
  STRESS_SEED     rng seed base
"""
import os
import sys

os.environ.setdefault("LAMBDA_SWB_BT", "8")
os.environ.setdefault("LAMBDA_SWB_BTL", "128")

import numpy as np
import jax

TRIALS = int(os.environ.get("STRESS_TRIALS", "200"))
XDROP = int(os.environ.get("STRESS_XDROP", "0"))
if XDROP < 0:   # -1 = randomize X per trial from a small static set
    XDROP = 0
USE_PALLAS = os.environ.get("STRESS_PALLAS", "1") == "1"
SEED = int(os.environ.get("STRESS_SEED", "0"))

if XDROP:
    os.environ["LAMBDA_SW_XDROP"] = str(XDROP)

from lambda_tpu.ops import sw_band, sw_xla
from lambda_tpu import native

CPU = jax.devices("cpu")[0]
lib = native.get_lib()
assert lib is not None, "native lib must build for the stress run"

fails = 0
XSET = [5, 17, 40]
VARY_X = os.environ.get("STRESS_VARY_X") == "1"
for t in range(TRIALS):
    rng = np.random.default_rng(SEED * 100003 + t)
    if VARY_X:
        XDROP = XSET[t % len(XSET)]
    A = int(rng.choice([4, 6, 16, 27]))
    subst = rng.integers(-6, 3, size=(A, A)).astype(np.int32)
    diag = rng.integers(1, 9, size=A)
    np.fill_diagonal(subst, diag)
    if rng.random() < 0.1:
        subst = np.full((A, A), -abs(int(rng.integers(1, 5))), np.int32)
    gap_extend = -int(rng.integers(1, 5))
    gap_first = gap_extend - int(rng.integers(0, 15))
    # FIXED array shapes (one XLA/pallas compile per campaign); all
    # variability lives in lengths, bands, and content
    B, M, N = 8, 48, 56
    Dmax = int(rng.choice([3, 9, 13]))
    d_rows = rng.integers(1, Dmax + 1, size=B).astype(np.int32)
    d_rows[0] = Dmax   # pin the batch D so kernels compile once per Dmax
    D = int(d_rows.max())
    qlens = rng.integers(1, M + 1, size=B)
    slens = rng.integers(1, N + 1, size=B)
    q = np.full((B, M), A, np.int32)
    s = np.full((B, N), A, np.int32)
    for b in range(B):
        q[b, :qlens[b]] = rng.integers(0, A, size=qlens[b])
        s[b, :slens[b]] = rng.integers(0, A, size=slens[b])
        if rng.random() < 0.5:  # embed a homologous fragment
            L = min(int(qlens[b]), int(slens[b]), 30)
            off = int(rng.integers(0, max(1, slens[b] - L + 1)))
            s[b, off:off + L] = q[b, :L]

    if os.environ.get("STRESS_RAND_NC") == "1":
        nc_plan = int(rng.integers(1, N + 1))
    else:
        nc_plan = sw_band._plan(N, D)[3]
    nc_rows = np.full(B, nc_plan, np.int32)

    def ref_row(b):
        qq, ss = q[b][q[b] < A], s[b][s[b] < A]
        if XDROP:
            return sw_band.sw_band_xdrop_reference(
                qq, ss, int(d_rows[b]), subst, gap_first, gap_extend,
                x_drop=XDROP, nc=nc_plan)
        return sw_band.sw_band_reference(qq, ss, int(d_rows[b]), subst,
                                         gap_first, gap_extend)

    want = np.array([ref_row(b) for b in range(B)], np.int64)

    ctx = dict(A=A, gaps=(gap_first, gap_extend), B=B, M=M, N=N,
               d=d_rows.tolist(), qlens=qlens.tolist(),
               slens=slens.tolist(), trial=t, xdrop=XDROP)

    def check(name, thunk):
        global fails
        try:
            got = np.asarray(thunk(), np.int64)
        except Exception as e:
            fails += 1
            print(f"CRASH {name} trial={t}: {type(e).__name__}: {e} "
                  f"ctx={ctx}", flush=True)
            return
        if not np.array_equal(got, want):
            fails += 1
            print(f"FAIL {name} trial={t}: got {got.tolist()} "
                  f"want {want.tolist()} ctx={ctx}", flush=True)

    # --- native host kernel
    q_list = [q[b][q[b] < A] for b in range(B)]
    s_list = [s[b][s[b] < A] for b in range(B)]
    check("native", lambda: native.sw_score_batch(
        q_list, s_list, subst, gap_first, gap_extend, band=d_rows,
        nc=nc_rows if XDROP else None, x_drop=XDROP))

    # --- XLA fallback
    e1 = sw_xla.extend_matrix(subst)
    dq = jax.device_put(q, CPU)
    ds = jax.device_put(s, CPU)
    de = jax.device_put(e1, CPU)
    dd = jax.device_put(d_rows, CPU)
    if XDROP:
        check("xla", lambda: sw_xla.sw_xdrop_score_batch(
            dq, ds, de, gap_first, gap_extend, dd,
            jax.device_put(nc_rows, CPU), XDROP))
    else:
        check("xla", lambda: sw_xla.sw_score_batch(
            dq, ds, de, gap_first, gap_extend, band_d=dd)[0])

    # --- pallas interpret
    if USE_PALLAS:
        from lambda_tpu.ops import sw_pallas
        e8 = sw_pallas.extend_matrix8(subst)
        check("pallas", lambda: sw_band.sw_band_score_pallas(
            q, s, d_rows, e8, gap_first, gap_extend, interpret=True))

    # --- traceback consistency (plain DP only: trace has no x-drop)
    if not XDROP:
        sc, traces = native.sw_traceback_batch(
            q_list, s_list, subst, gap_first, gap_extend, band=d_rows)
        check("native-trace-score", lambda: sc)
        for b in range(B):
            if traces[b] is None:
                if want[b] != 0:
                    fails += 1
                    print(f"FAIL native-trace none trial={t} b={b} "
                          f"want={want[b]} ctx={ctx}", flush=True)
                continue
            q0, s0, ops = traces[b]
            rs = sw_xla.score_of_ops(q_list[b], s_list[b], q0, s0, ops,
                                     subst, gap_first, gap_extend)
            if rs != want[b]:
                fails += 1
                print(f"FAIL native-trace ops trial={t} b={b}: rescore "
                      f"{rs} want {want[b]} ctx={ctx}", flush=True)

        # XLA direction pass + host walk
        best, bi, bj, dirs = (np.asarray(x) for x in sw_xla.sw_align_batch(
            dq, ds, de, gap_first, gap_extend, band_d=dd))
        check("xla-align-score", lambda: best)
        for b in range(B):
            if best[b] <= 0:
                continue
            q0, s0, ops = sw_xla.traceback(dirs, b, int(bi[b]), int(bj[b]))
            rs = sw_xla.score_of_ops(q_list[b], s_list[b], q0, s0, ops,
                                     subst, gap_first, gap_extend)
            if rs != want[b]:
                fails += 1
                print(f"FAIL xla-trace ops trial={t} b={b}: rescore {rs} "
                      f"want {want[b]} ctx={ctx}", flush=True)

    if (t + 1) % 20 == 0:
        print(f"# {t + 1}/{TRIALS} trials, {fails} failures", flush=True)

print(f"DONE trials={TRIALS} xdrop={XDROP} failures={fails}")
sys.exit(1 if fails else 0)
