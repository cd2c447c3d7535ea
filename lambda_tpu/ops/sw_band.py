"""Banded Smith-Waterman score kernel (Pallas TPU) — the round-2 hot
kernel.

The reference *wanted* banded extension and could not have it (SeqAn2's
SIMD alignment cannot band, ``/root/reference/src/search_algo.hpp:1102``)
so it widens every match to the full query plus a sqrt-band subject
margin (``search_misc.hpp:46-50``) and pays for the whole rectangle.
This kernel computes only the diagonal band the widener intended:

* Window convention: the caller builds a *virtual* subject window such
  that the band is exactly ``d = j - i ∈ [0, D]`` (query position i,
  window position j).  Positions outside the real subject are PAD rank.
* Default 'lane' layout: band offset ``w = i - j + D`` on the LANE axis
  with P = 128 // (D+1 padded to 8) alignments PACKED per 128-lane
  register (wraparound between packs killed by additive -inf masks),
  batch on sublanes.  Moving one subject column keeps the diagonal
  predecessor in the same (w) slot, pulls E/H from ``w+1``, and runs
  the F max-plus prefix scan along ascending ``w`` in log2(Ws)
  lane-rolls — the same doubling scan as ops/sw_pallas.py but over the
  band instead of the query, so a 256aa query costs ~40 lane-cells per
  column instead of 256+.
* The banded substitution image is built WITHOUT gathers and WITHOUT
  per-match matmuls: the query ranks are sheared into band coordinates
  by Ws shifted slices, the per-(b, j) substitution column is packed
  into uint32 words by one unbatched one-hot matmul + bitcast, and the
  per-cell score is a K-way select + variable byte extract — all fused
  elementwise.  (The rectangle-image + stride-shear approach measured
  3.4 ms of batched tiny-K matmuls + ~4 ms of copies on the flagship
  shape; this path replaces it.)
* Per-row band widths: each alignment carries its true band size
  ``D_row <= D`` so results are independent of how alignments are
  grouped into kernel batches (batch-size/shard determinism, CLAUDE.md
  conventions).  Bands are enforced at the CELL level in the kernels
  (off-band E -> -inf, H -> 0, F-scan sources -> -inf) — masking only
  the substitution image is insufficient because pure gap corridors
  cross off-band lanes without touching it (found+fixed in round-2
  review; bench.py gates the counterexample).
* The 'sublane' layout (band on sublanes, LAMBDA_SWB_LAYOUT=sublane) is
  kept for A/B: its DP measured fastest (0.6 ms) but its image needs a
  batch-to-minor transpose that costs 10x the DP.

Scoring/gap conventions match ops/sw_pallas.py (search_algo.hpp:226-230).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG32 = -(2 ** 27)
PAD_SCORE8 = -128

_BTL_CAP = int(os.environ.get("LAMBDA_SWB_BTL", "1024"))
# kernel layout: 'lane' = batch on sublanes, band on lanes with power-of-2
# packing (P = 128//Ws alignments per lane register) — the fast layout:
# its image feeds the kernel through the same cheap major-axis transpose
# the rectangle kernel uses.  'sublane' = band on sublanes (keeps the
# image batch-minor; measured 0.6 ms DP but 7.2 ms image/transpose on
# the flagship shape — kept for A/B).
_LAYOUT = os.environ.get("LAMBDA_SWB_LAYOUT", "lane")
_BT_CAP = int(os.environ.get("LAMBDA_SWB_BT", "512"))
# optional BLAST-style X-drop early exit in the score kernel: terminate a
# tile's column sweep once every alignment's running score is X below its
# own best.  OFF by default (0) — exact band semantics; turning it on can
# drop alignments that restart after a deep trough (PARITY.md).
_XDROP = int(os.environ.get("LAMBDA_SW_XDROP", "0"))


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def band_pad(D: int) -> int:
    """Sublane band width for band size D (w in [0, D] plus tile pad)."""
    return _ceil(D + 1, 8)


def lane_tile(W: int) -> int:
    """Batch lanes per kernel program (bigger tiles keep the VPU busy;
    VMEM budget: 3 int32 (W, BTL) state arrays — 12*W*BTL bytes — plus
    a double-buffered (NC>=8, W, BTL) int8 input block must fit scoped
    VMEM; W*BTL <= 2^18 keeps the state ~3 MB and an 8-col block 2 MB)."""
    btl = (1 << 18) // max(W, 8)
    btl = max(128, min(_BTL_CAP, btl))
    return (btl // 128) * 128


def _plan(Ns: int, D: int, layout: str | None = None):
    """Tile plan for a (window=Ns, band=D) bucket: returns
    (N, W, BROWS, NC, JB) with N a multiple of NC, the subject columns
    per VMEM chunk.  BROWS is the batch-padding unit (alignment rows
    per kernel tile); W the per-alignment band width the image is
    sheared to.  JB == N (kept in the tuple for callers that unpack 5;
    the retired MXU stride-shear image was its only real consumer, and
    its 512-block rounding inflated N — and with it DP work and image
    HBM — by up to ~1.8x for windows past 512 columns)."""
    layout = layout or _LAYOUT
    if layout == "lane":
        Ws, P, LW, BT = _lane_geometry(D)
        W = Ws
        BROWS = BT * P
        bytes_per_col = BT * LW
    else:
        W = band_pad(D)
        BROWS = lane_tile(W)
        bytes_per_col = W * BROWS
    NC = max(2 * 1024 * 1024 // bytes_per_col, 8)
    NC = 1 << int(np.log2(NC))
    N = max(_ceil(Ns, 8), W)
    if NC >= N:
        NC = N = _ceil(N, 8)
    else:
        N = _ceil(N, NC)
    return N, W, BROWS, NC, N


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "BTL", "D", "W", "N"))
def _band_image_sub(q, s, d_rows, subst_ext8, n_tiles, BTL, D, W, N):
    """Banded substitution image in SUBLANE layout (T, N, W, BTL) int8,
    built WITHOUT any large batch-to-minor transpose: the (tiny) rank
    arrays are transposed first (B x N int8 ~ 1 MB), the sheared query
    ranks are W major-axis slices of the transposed buffer, the
    substitution column bytes come from 4 unbatched one-hot dots (one
    per byte lane of the packed uint32 words), and the per-cell score is
    a K-way select + variable byte extract — all in the kernel's own
    layout.  Per-row band masks are baked in (-128 off-band)."""
    B = q.shape[0]
    C = subst_ext8.shape[0]
    C4 = _ceil(C, 4)
    K4 = C4 // 4
    pad_rank = C - 1

    # transposed rank buffers (cheap: int8, ~N*B bytes)
    qp = jnp.concatenate(
        [jnp.full((B, D), pad_rank, jnp.int8), q.astype(jnp.int8),
         jnp.full((B, W), pad_rank, jnp.int8)], axis=1)
    qpT = qp.T                                                   # (N+D+W, B)
    sT = s.astype(jnp.int8).T                                    # (N, B)

    # sheared query ranks, sublane layout: QSH[j, w, b] = q[b, j + w - D]
    qsh = jnp.stack([qpT[w : w + N, :] for w in range(W)], axis=1)
    qsh = qsh.astype(jnp.int32)                                  # (N, W, B)

    # packed substitution columns, one unbatched dot per byte lane:
    # tblm[m][k, c_s] = S[4k + m, c_s]
    iota = jnp.arange(C, dtype=jnp.int32)
    ohs = (sT[:, :, None] == iota).astype(jnp.bfloat16)          # (N, B, C)
    tdev = jnp.full((C4, C), jnp.int32(PAD_SCORE8))
    tdev = tdev.at[:C, :].set(subst_ext8.astype(jnp.int32))
    words = []
    for m in range(4):
        tm = tdev[m::4, :]                                       # (K4, C)
        pm = jax.lax.dot_general(
            ohs, tm.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)                 # (N, B, K4)
        words.append(pm.astype(jnp.int32) & 0xFF)
    prof = (words[0] | (words[1] << 8) | (words[2] << 16)
            | (words[3] << 24)).astype(jnp.uint32)               # (N, B, K4)

    # select word + extract byte, broadcast over w
    word = qsh >> 2                                              # (N, W, B)
    sel = jnp.zeros((N, W, B), jnp.uint32)
    for k in range(K4):
        sel = jnp.where(word == k, prof[:, None, :, k], sel)
    # STATIC shifts only: per-element (variable) shift amounts lower
    # catastrophically on TPU (measured ~10x the expected op cost)
    seli = sel.astype(jnp.int32)
    mby = qsh & 3
    byte = jnp.where(mby == 0, seli & 0xFF,
                     jnp.where(mby == 1, (seli >> 8) & 0xFF,
                               jnp.where(mby == 2, (seli >> 16) & 0xFF,
                                         (seli >> 24) & 0xFF)))
    subb = ((byte + 128) & 0xFF) - 128
    # per-row band mask baked in: valid offsets w in [D - d_row, D]
    wio = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    in_band = (wio >= (jnp.int32(D) - d_rows)[None, None, :]) & (wio <= D)
    subb = jnp.where(in_band, subb, PAD_SCORE8).astype(jnp.int8)

    # (N, W, B) -> (T, N, W, BTL): BTL-contiguous runs, cheap major perm
    subb = subb.reshape(N, W, n_tiles, BTL).transpose(2, 0, 1, 3)
    return subb


def _lane_geometry(D: int):
    """Lane-layout geometry: per-alignment band width Ws = D+1 padded to
    8, P alignments packed per 128-lane register (dead lanes masked),
    LW total lanes, BT batch sublanes per tile."""
    Ws = _ceil(D + 1, 8)
    P = max(1, 128 // Ws)
    LW = max(_ceil(Ws, 128), 128)
    BT = max(8, min(_BT_CAP, (1 << 21) // (LW * 4)))  # ~2 MB state x3
    BT = (BT // 8) * 8
    return Ws, P, LW, BT


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "BT", "P", "LW", "D", "Ws",
                                    "N"))
def _band_image_lane(q, s, d_rows, subst_ext8, n_tiles, BT, P, LW, D, Ws, N):
    """Sheared banded substitution image in LANE layout without any
    matmuls over match batches: (T, N, BT, LW) int8 with row
    b = ((t*BT + bt)*P + p) on (sublane bt, lane-group p).

    Build (all fused elementwise / cheap slices — the earlier MXU
    one-hot + stride-shear pipeline measured 3.4 ms of batched tiny-K
    matmuls plus ~4 ms of cast/copy traffic on the flagship shape):
      1. QSH[b, j, w] = q[b, j + w - D]  — W shifted SLICES of the rank
         array (the shear on ranks costs nothing; PAD ranks pad i<0/i>=N)
      2. PROF[b, j, k] = packed uint32 of 4 int8 scores
         S[4k..4k+3, s[b,j]] — ONE unbatched one-hot matmul (B*N, C) @
         (C, C4) then a bitcast, no per-match batching
      3. SUBB = byte-extract(PROF[word(QSH)], QSH & 3) — K4-way select
         plus variable shifts, fully fused over (B, N, Ws)
    """
    B = q.shape[0]
    C = subst_ext8.shape[0]
    C4 = _ceil(C, 4)
    K4 = C4 // 4
    pad_rank = C - 1

    # 1. sheared query ranks (int8 keeps the stacked intermediate small)
    qp = jnp.concatenate(
        [jnp.full((B, D), pad_rank, jnp.int8), q.astype(jnp.int8),
         jnp.full((B, Ws), pad_rank, jnp.int8)], axis=1)
    qsh = jnp.stack([qp[:, w : w + N] for w in range(Ws)], axis=2)  # B,N,Ws
    qsh = qsh.astype(jnp.int32)

    # 2. packed substitution columns for the subject chars
    # table[c_q, c_s] padded to C4 rows with PAD scores
    tbl = jnp.full((C4, C), jnp.int8(PAD_SCORE8))
    tbl = tbl.at[:C, :].set(subst_ext8.astype(jnp.int8))
    iota = jnp.arange(C, dtype=jnp.int32)
    ohs = (s[:, :, None] == iota).astype(jnp.bfloat16)              # B,N,C
    prof = jax.lax.dot_general(
        ohs, tbl.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.bfloat16)                         # B,N,C4
    prof = jax.lax.bitcast_convert_type(
        prof.astype(jnp.int8).reshape(B, N, K4, 4), jnp.uint32)      # B,N,K4

    # 3. select the word, extract the byte (sign-extended)
    word = qsh >> 2                                                  # 0..K4-1
    sel = jnp.zeros((B, N, Ws), jnp.uint32)
    for k in range(K4):
        sel = jnp.where(word == k, prof[:, :, k][:, :, None], sel)
    shift = (3 - (qsh & 3)) << 3
    subb = (sel.astype(jnp.int32) << shift) >> 24
    # per-row band mask baked into the image: valid offsets are
    # w in [D - d_row, D] (the kernel then needs no masking at all)
    wio = jnp.arange(Ws, dtype=jnp.int32)[None, None, :]
    in_band = (wio >= (jnp.int32(D) - d_rows)[:, None, None]) & (wio <= D)
    subb = jnp.where(in_band, subb, PAD_SCORE8).astype(jnp.int8)

    if P == 1:
        # wide bands (Ws >= 128): skip the size-1 P axis — the 5-d
        # reshape/transpose below otherwise materializes tile-padded
        # temps with a 1-extent minor dimension (128x HBM expansion,
        # OOM at production batch sizes on long-query shapes)
        subb = subb.reshape(n_tiles, BT, N, Ws).transpose(0, 2, 1, 3)
    else:
        subb = subb.reshape(n_tiles, BT, P, N, Ws).transpose(0, 3, 1, 2, 4)
        subb = subb.reshape(n_tiles, N, BT, P * Ws)
    if P * Ws < LW:
        subb = jnp.pad(subb, ((0, 0), (0, 0), (0, 0), (0, LW - P * Ws)),
                       constant_values=PAD_SCORE8)
    return subb


def _make_band_dirs_kernel(NC: int, Ws: int, LW: int, BT: int,
                           D: int, gap_first: int, gap_extend: int):
    """Direction-emitting variant of the lane-layout banded kernel
    (pass 2 of the two-pass extension, search_algo.hpp:1296): per cell a
    packed uint8 code in the sw_xla encoding (2-bit H source + E/F
    extend bits), plus per-(row, lane) best score and best column for
    the host walk (ops/sw_band.traceback)."""
    neg = NEG32
    steps = []
    st = 1
    while st < Ws:
        steps.append(st)
        st *= 2

    def kernel(sub_ref, wmin_ref, dirs_ref, best_ref, bestj_ref, H_ref,
               E_ref):
        def roll(x, s):
            return pltpu.roll(x, shift=s, axis=1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, LW), dimension=1)
        wloc = lane % Ws
        ge = jnp.int32(gap_extend)
        gf = jnp.int32(gap_first)
        top = wloc == Ws - 1
        ge_c = jnp.where(top, jnp.int32(neg), ge)
        gf_c = jnp.where(top, jnp.int32(neg), gf)
        gf_f = jnp.where(wloc == 0, jnp.int32(neg), gf)
        c_steps = [jnp.where(wloc < s, jnp.int32(neg),
                             jnp.int32(max(s * gap_extend, neg)))
                   for s in steps]
        # strict per-row band mask (see _make_band_kernel_lane)
        valid = (wloc >= wmin_ref[0, :, :]) & (wloc <= D)

        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            H_ref[:] = jnp.zeros((BT, LW), jnp.int32)
            E_ref[:] = jnp.full((BT, LW), jnp.int32(neg))
            best_ref[0] = jnp.zeros((BT, LW), jnp.int32)
            bestj_ref[0] = jnp.zeros((BT, LW), jnp.int32)

        def body(j, _):
            H = H_ref[:]
            subcol = sub_ref[0, j, :, :].astype(jnp.int32)
            ea = roll(E_ref[:], LW - 1) + ge_c
            eb = roll(H, LW - 1) + gf_c
            E = jnp.where(valid, jnp.maximum(ea, eb), jnp.int32(neg))
            diag = H + subcol
            Htmp = jnp.maximum(jnp.maximum(diag, E), jnp.int32(0))
            Fsrc = jnp.where(valid, Htmp, jnp.int32(neg))
            F = roll(Fsrc, 1) + gf_f
            for s, cs in zip(steps, c_steps):
                F = jnp.maximum(F, roll(F, s) + cs)
            Hn = jnp.maximum(Htmp, F)
            Hn = jnp.where(valid, Hn, jnp.int32(0))

            # direction code, sw_xla encoding; tie priority diag > E > F
            pos = Hn > 0
            code = jnp.where(pos & (Hn == F), jnp.int32(3), 0)
            code = jnp.where(pos & (Hn == E), jnp.int32(2), code)
            code = jnp.where(pos & (Hn == diag), jnp.int32(1), code)
            # extend bits; at pack boundaries the rolled values wrap to a
            # different alignment — force False there, matching the
            # masked-NEG semantics of the XLA/native backends
            code = code | jnp.where((ea >= eb) & ~top, jnp.int32(4), 0)
            # F-extend: F[i] == F[i-1] + ge with H[i-1] the final masked
            # cell value (= Hn[i-1]), matching the XLA masked semantics
            f_ext = (roll(F, 1) + ge) >= (roll(Hn, 1) + gf)
            code = code | jnp.where(f_ext & (wloc != 0), jnp.int32(8), 0)
            dirs_ref[0, j, :, :] = code.astype(jnp.uint8)

            jcol = c * NC + j
            upd = Hn > best_ref[0]
            best_ref[0] = jnp.where(upd, Hn, best_ref[0])
            bestj_ref[0] = jnp.where(upd, jcol, bestj_ref[0])
            H_ref[:] = Hn
            E_ref[:] = E
            return 0

        jax.lax.fori_loop(0, NC, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "N", "Ws", "LW", "BT", "NC",
                                    "D", "gap_first", "gap_extend",
                                    "interpret"))
def _dirs_band_lane(subb, wmin, n_tiles, N, Ws, LW, BT, NC, D, gap_first,
                    gap_extend, interpret):
    assert N % NC == 0, (N, NC)
    n_chunks = N // NC
    # (the dirs kernel writes its outputs every chunk — no last-chunk
    # epilogue, so it does not need n_chunks)
    kernel = _make_band_dirs_kernel(NC, Ws, LW, BT, D,
                                    gap_first, gap_extend)
    dirs, best, bestj = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, N, BT, LW), jnp.uint8),
                   jax.ShapeDtypeStruct((n_tiles, BT, LW), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, BT, LW), jnp.int32)),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, NC, BT, LW), lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, BT, LW), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, NC, BT, LW), lambda t, c: (t, c, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, BT, LW), lambda t, c: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, BT, LW), lambda t, c: (t, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((BT, LW), jnp.int32) for _ in range(2)],
        interpret=interpret,
        **({} if interpret else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))),
    )(subb, wmin)
    return dirs, best, bestj


def trace_tile(B: int, D: int) -> int:
    """Batch sublanes for the TRACE pass: sized to the survivor count
    (pass 2 runs on few rows, and the dirs tensor is D2H-transferred —
    on remote-attached chips the link is slow, so a full 512-sublane
    tile for a handful of survivors costs seconds)."""
    Ws, P, LW, BT0 = _lane_geometry(D)
    need = -(-max(B, 1) // P)
    bt = 8
    while bt < need and bt < BT0:
        bt *= 2
    return min(bt, BT0)


def sw_band_align_device(q, s, d_rows, subst_ext8, D: int,
                         gap_first: int, gap_extend: int,
                         interpret: bool = False, bt: int | None = None):
    """Direction-emitting banded pass (lane layout only).  Same inputs
    as sw_band_score_device (B must be a multiple of bt*P); returns
    (dirs, best, bestj) device arrays for the host walk — see
    :func:`traceback_banded`."""
    B, N = q.shape
    Ws, P, LW, BT = _lane_geometry(D)
    if bt is not None:
        BT = bt
    BROWS = BT * P
    NC = max(2 * 1024 * 1024 // (BT * LW), 8)
    NC = 1 << int(np.log2(NC))
    NC = min(NC, N)
    while NC > 8 and N % NC:
        NC //= 2
    assert B % BROWS == 0 and N % NC == 0, (B, BROWS, N, NC)
    n_tiles = B // BROWS
    subb = _band_image_lane(q, s, d_rows, subst_ext8, n_tiles, BT, P,
                            LW, D, Ws, N)
    wmin = _lane_wmin(d_rows, D, n_tiles, BT, P, Ws, LW)
    return _dirs_band_lane(subb, wmin, n_tiles, N, Ws, LW, BT, NC, D,
                           int(gap_first), int(gap_extend), interpret)


def _pad_host_inputs(q, s, d_rows, N: int, Bp: int, pad_rank: int,
                     interpret: bool):
    """Shared host preamble of the score/align pallas entry points: pad
    ranks to (Bp, N) with PAD, pad d_rows with the -1 sentinel (wmin
    becomes D+1 — no lane ever in band, so batch-padding rows score 0
    AND never hold an X-drop tile alive), and pick the device_put
    (interpret mode pins to CPU per the axon trap, CLAUDE.md).

    A query wider than the padded window is clipped to N columns: a
    query row i can only pair with window positions j >= i (band
    offsets are non-negative), so rows beyond the last window column
    are out of band for every cell and cannot contribute."""
    B, Mq = q.shape
    Ns = s.shape[1]
    qp = np.full((Bp, N), pad_rank, dtype=np.int32)
    qp[:B, :min(Mq, N)] = q[:, :N]
    sp = np.full((Bp, N), pad_rank, dtype=np.int32)
    sp[:B, :Ns] = s
    dr = np.full(Bp, -1, dtype=np.int32)
    dr[:B] = d_rows
    if interpret:
        dev = jax.devices("cpu")[0]
        put = functools.partial(jax.device_put, device=dev)
    else:
        put = jnp.asarray
    return qp, sp, dr, put


def sw_band_align_pallas(q: np.ndarray, s: np.ndarray, d_rows: np.ndarray,
                         subst_ext8, gap_first: int, gap_extend: int,
                         interpret: bool = False):
    """Host API for the direction-emitting pass: pads like
    sw_band_score_pallas, runs the dirs kernel, walks each row on host.
    Returns (scores, traces) in the extend._run_bucketed conventions:
    traces[i] = (q0, s0, rle-ops) or None for score-0 rows."""
    B, Mq = q.shape
    Ns = s.shape[1]
    D = int(d_rows.max()) if len(d_rows) else 0
    pad_rank = int(np.asarray(subst_ext8).shape[0]) - 1
    N, W, _, _, _ = _plan(Ns, D, layout="lane")
    Ws, P, _, _ = _lane_geometry(D)
    BT = trace_tile(B, D)
    BROWS = BT * P
    Bp = _ceil(max(B, 1), BROWS)

    qp, sp, dr, put = _pad_host_inputs(q, s, d_rows, N, Bp, pad_rank,
                                       interpret)
    dirs, best, bestj = sw_band_align_device(
        put(qp), put(sp), put(dr), put(np.asarray(subst_ext8)), D,
        gap_first, gap_extend, interpret, bt=BT)
    dirs = np.asarray(dirs)
    best = np.asarray(best)
    bestj = np.asarray(bestj)
    scores = np.zeros(B, dtype=np.int64)
    traces: list = [None] * B
    for b in range(B):
        sc, q0, s0, ops = traceback_banded(dirs, best, bestj, b, D, Ws)
        scores[b] = sc
        if sc > 0:
            traces[b] = (q0, s0, ops)
    return scores, traces


def traceback_banded(dirs: np.ndarray, best: np.ndarray, bestj: np.ndarray,
                     b: int, D: int, Ws: int):
    """Walk the packed banded direction bits for alignment row ``b``.

    dirs: (T, N, BT, LW) uint8; best/bestj: (T, BT, LW) int32 from
    sw_band_align_device (host numpy).  Returns (score, q0, s0, ops)
    with (q0, s0) 0-based window-relative starts and ops in the
    sw_xla.traceback conventions ('M'/'D'/'I' run-length list), or
    score 0 with no ops.  Best-cell tie-breaking reproduces the
    native/XLA rule: maximum H, then smallest i+j, then smallest i.
    """
    T, N, BT, LW = dirs.shape
    P = LW // Ws
    t, r = divmod(b, BT * P)
    bt, p = divmod(r, P)
    lanes = slice(p * Ws, (p + 1) * Ws)
    row_best = best[t, bt, lanes]
    score = int(row_best.max(initial=0))
    if score <= 0:
        return 0, 0, 0, []
    cands = np.nonzero(row_best == score)[0]
    # end cell per candidate lane w: j = bestj, i = j + w - D (0-based
    # chars consumed: cell (i, j) means q[0..i], s[0..j] consumed)
    pick_w, pick_j, pick_key = -1, -1, None
    for w in cands:
        j = int(bestj[t, bt, p * Ws + w])
        i = j + int(w) - D
        key = (i + j, i)
        if pick_key is None or key < pick_key:
            pick_key, pick_w, pick_j = key, int(w), j
    w, j = pick_w, pick_j
    ops: list[str] = []
    state = "H"
    while True:
        code = int(dirs[t, j, bt, p * Ws + w]) if (j >= 0 and
                                                   0 <= w < Ws) else 0
        if state == "H":
            h = code & 3
            if h == 0 or j < 0 or (j + w - D) < 0:
                break
            if h == 1:
                ops.append("M")
                j -= 1            # w unchanged (diag)
            elif h == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            ops.append("D")
            ext = bool(code & 4)
            j -= 1
            w += 1
            state = "E" if ext else "H"
        else:
            ops.append("I")
            ext = bool(code & 8)
            w -= 1
            state = "F" if ext else "H"

    i0 = j + w - D + 1            # start coords (0-based, inclusive)
    s0 = j + 1
    ops.reverse()
    rle: list[tuple[str, int]] = []
    for op in ops:
        if rle and rle[-1][0] == op:
            rle[-1] = (op, rle[-1][1] + 1)
        else:
            rle.append((op, 1))
    return score, i0, s0, rle


def _make_band_kernel_lane(NC: int, Ws: int, LW: int, BT: int,
                           n_chunks: int, D: int, gap_first: int,
                           gap_extend: int, x_drop: int = 0):
    """Banded DP, lane layout: per column the band offset w lives on the
    lane axis (lane % Ws), batch on sublanes, P = LW//Ws alignments per
    lane register.  Rolls are LANE rolls (the proven-fast primitive of
    ops/sw_pallas.py); wraparound across pack boundaries is killed by
    the per-lane additive -inf constants."""
    neg = NEG32
    steps = []
    st = 1
    while st < Ws:
        steps.append(st)
        st *= 2

    def kernel(sub_ref, wmin_ref, out_ref, H_ref, E_ref, best_ref,
               *xd):
        def roll(x, s):
            return pltpu.roll(x, shift=s, axis=1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, LW), dimension=1)
        wloc = lane % Ws
        ge = jnp.int32(gap_extend)
        gf = jnp.int32(gap_first)
        top = wloc == Ws - 1
        # E/H pull from w+1 (lane+1); top-of-pack has no source
        ge_c = jnp.where(top, jnp.int32(neg), ge)
        gf_c = jnp.where(top, jnp.int32(neg), gf)
        # F init pulls from w-1 (lane-1); bottom-of-pack has no source
        gf_f = jnp.where(wloc == 0, jnp.int32(neg), gf)
        c_steps = [jnp.where(wloc < s, jnp.int32(neg),
                             jnp.int32(max(s * gap_extend, neg)))
                   for s in steps]
        # strict per-row band mask: off-band CELLS are dead (E -> -inf,
        # H -> 0, F sources -> -inf), exactly like the masked XLA/native
        # DPs.  Masking only the substitution image is NOT enough: pure
        # gap corridors (E runs descending lanes, F runs ascending)
        # carry positive scores across off-band lanes without touching
        # the image.  Band contiguity makes masking the F-scan SOURCES
        # sufficient: any in-band-to-in-band doubling jump has all its
        # intermediates in band.
        valid = (wloc >= wmin_ref[0, :, :]) & (wloc <= D)

        def pack_max(x):
            # segmented max over each Ws-lane pack (ascending prefix max
            # then descending propagate, doubling; pack-crossing sources
            # masked to -inf)
            m = x
            for s in steps:
                m = jnp.maximum(m, jnp.where(wloc < s, jnp.int32(neg),
                                             roll(m, s)))
            for s in steps:
                m = jnp.maximum(m, jnp.where(wloc >= Ws - s,
                                             jnp.int32(neg),
                                             roll(m, LW - s)))
            return m

        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            H_ref[:] = jnp.zeros((BT, LW), jnp.int32)
            E_ref[:] = jnp.full((BT, LW), jnp.int32(neg))
            best_ref[:] = jnp.zeros((BT, LW), jnp.int32)
            if x_drop > 0:
                xd[0][:] = jnp.zeros((BT, LW), jnp.int32)   # dead mask
                xd[1][0, 0] = jnp.int32(1)                  # tile alive

        def body(j, _):
            H = H_ref[:]
            subcol = sub_ref[0, j, :, :].astype(jnp.int32)
            E = jnp.maximum(roll(E_ref[:], LW - 1) + ge_c,
                            roll(H, LW - 1) + gf_c)
            E = jnp.where(valid, E, jnp.int32(neg))
            Htmp = jnp.maximum(jnp.maximum(H + subcol, E), jnp.int32(0))
            Fsrc = jnp.where(valid, Htmp, jnp.int32(neg))
            F = roll(Fsrc, 1) + gf_f
            for s, cs in zip(steps, c_steps):
                F = jnp.maximum(F, roll(F, s) + cs)
            Hn = jnp.maximum(Htmp, F)
            Hn = jnp.where(valid, Hn, jnp.int32(0))
            if x_drop > 0:
                # latched dead alignments contribute nothing further
                dead = xd[0][:] != 0
                Hn = jnp.where(dead, jnp.int32(0), Hn)
                E = jnp.where(dead, jnp.int32(neg), E)
            H_ref[:] = Hn
            E_ref[:] = E
            best_ref[:] = jnp.maximum(best_ref[:], Hn)
            return 0

        if x_drop > 0:
            # X-drop early termination (BLAST-style extension
            # termination, the reference's *intent* for banded
            # extension), PER ALIGNMENT and chunk-granular: after each
            # NC-column chunk, an alignment whose running scores
            # max(H, E) have fallen more than X below its OWN best is
            # latched dead (it cannot revive later — results are
            # independent of which alignments share a tile); the tile
            # skips remaining chunks once every alignment is dead.
            # Exact semantics: ops/sw_band.sw_band_xdrop_reference.
            @pl.when(xd[1][0, 0] != 0)
            def _():
                jax.lax.fori_loop(0, NC, body, 0)
                cur = pack_max(jnp.maximum(H_ref[:], E_ref[:]))
                pb = pack_max(best_ref[:])
                dead_now = (cur < pb - jnp.int32(x_drop)) & (pb > 0)
                xd[0][:] = jnp.where(dead_now, jnp.int32(1), xd[0][:])
                live = (xd[0][:] == 0) & valid
                xd[1][0, 0] = jnp.max(jnp.where(live, 1, 0))
        else:
            jax.lax.fori_loop(0, NC, body, 0)

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[0, :, :] = best_ref[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "N", "Ws", "LW", "BT", "NC",
                                    "D", "gap_first", "gap_extend",
                                    "interpret", "x_drop"))
def _score_band_lane(subb, wmin, n_tiles, N, Ws, LW, BT, NC, D, gap_first,
                     gap_extend, interpret, x_drop=0):
    assert N % NC == 0, (N, NC)
    n_chunks = N // NC
    kernel = _make_band_kernel_lane(NC, Ws, LW, BT, n_chunks, D,
                                    gap_first, gap_extend, x_drop)
    scratch = [pltpu.VMEM((BT, LW), jnp.int32) for _ in range(3)]
    if x_drop > 0:
        scratch.append(pltpu.VMEM((BT, LW), jnp.int32))   # dead mask
        scratch.append(pltpu.SMEM((1, 1), jnp.int32))     # tile alive
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, BT, LW), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, NC, BT, LW), lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, BT, LW), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BT, LW), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if interpret else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))),
    )(subb, wmin)
    # per-row best: reduce each pack's Ws lanes (dead lanes dropped);
    # P from the one source of truth for the packing rule
    _, P, _, _ = _lane_geometry(D)
    return out[:, :, :P * Ws].reshape(n_tiles, BT, P, Ws).max(axis=3)


def _make_band_kernel(NC: int, W: int, BTL: int, n_chunks: int, D: int,
                      gap_first: int, gap_extend: int):
    neg = NEG32
    steps = []
    st = 1
    while st < W:
        steps.append(st)
        st *= 2

    def kernel(sub_ref, wmin_ref, out_ref, H_ref, E_ref, best_ref):
        def roll_from_below(x, s):
            # y[w] = x[w - s] (wraparound killed by the additive consts)
            return pltpu.roll(x, shift=s, axis=0)

        def roll_from_above(x):
            # y[w] = x[w + 1]
            return pltpu.roll(x, shift=W - 1, axis=0)

        wio = jax.lax.broadcasted_iota(jnp.int32, (W, BTL), dimension=0)
        ge = jnp.int32(gap_extend)
        gf = jnp.int32(gap_first)
        top = wio == W - 1
        # E/H pull from w+1; lane W-1 has no source (additive -inf)
        ge_c = jnp.where(top, jnp.int32(neg), ge)
        gf_c = jnp.where(top, jnp.int32(neg), gf)
        # F init pulls from w-1; lane 0 has no source
        gf_f = jnp.where(wio == 0, jnp.int32(neg), gf)
        c_steps = [jnp.where(wio < s, jnp.int32(neg),
                             jnp.int32(max(s * gap_extend, neg)))
                   for s in steps]
        # strict per-row band mask (see _make_band_kernel_lane: image
        # masking alone lets pure gap corridors cross the band)
        valid = (wio >= wmin_ref[0, 0:1, :]) & (wio <= D)

        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            H_ref[:] = jnp.zeros((W, BTL), jnp.int32)
            E_ref[:] = jnp.full((W, BTL), jnp.int32(neg))
            best_ref[:] = jnp.zeros((W, BTL), jnp.int32)

        def body(j, _):
            H = H_ref[:]
            subcol = sub_ref[0, j, :, :].astype(jnp.int32)
            E = jnp.maximum(roll_from_above(E_ref[:]) + ge_c,
                            roll_from_above(H) + gf_c)
            E = jnp.where(valid, E, jnp.int32(neg))
            Htmp = jnp.maximum(jnp.maximum(H + subcol, E), jnp.int32(0))
            Fsrc = jnp.where(valid, Htmp, jnp.int32(neg))
            F = roll_from_below(Fsrc, 1) + gf_f
            for s, cs in zip(steps, c_steps):
                F = jnp.maximum(F, roll_from_below(F, s) + cs)
            Hn = jnp.maximum(Htmp, F)
            Hn = jnp.where(valid, Hn, jnp.int32(0))
            H_ref[:] = Hn
            E_ref[:] = E
            best_ref[:] = jnp.maximum(best_ref[:], Hn)
            return 0

        jax.lax.fori_loop(0, NC, body, 0)

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[0, 0, :] = jnp.max(best_ref[:], axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "N", "W", "BTL", "NC", "D",
                                    "gap_first", "gap_extend", "interpret"))
def _score_band_padded(subb, wmin, n_tiles, N, W, BTL, NC, D, gap_first,
                       gap_extend, interpret):
    assert N % NC == 0, (N, NC)
    n_chunks = N // NC
    kernel = _make_band_kernel(NC, W, BTL, n_chunks, D, gap_first, gap_extend)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, BTL), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, NC, W, BTL), lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, BTL), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, BTL), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, BTL), jnp.int32) for _ in range(3)],
        interpret=interpret,
        # default scoped VMEM is 16 MB; wide (merged) bands need headroom
        # (v5e has ~128 MB, CLAUDE.md "Mosaic/v5e kernel facts")
        **({} if interpret else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))),
    )(subb, wmin)
    return out[:, 0, :]


def pad_cols(Ns: int, D: int) -> int:
    """Window padding the kernel needs for band size D."""
    return _plan(Ns, D)[0]


def image_bytes(B: int, N: int, D: int, layout: str | None = None) -> int:
    """HBM bytes of the banded substitution image for a (B, N, D) bucket
    (the dominant transient of the score pass; used by the device-memory
    preflight — checkRAM's device analogue, search_algo.hpp:126-155)."""
    layout = layout or _LAYOUT
    if layout == "lane":
        Ws, P, LW, BT = _lane_geometry(D)
        n_tiles = -(-B // (BT * P))
        return n_tiles * N * BT * LW
    W = band_pad(D)
    return _ceil(B, lane_tile(W)) * N * W


def _lane_wmin(d_rows, D, n_tiles, BT, P, Ws, LW):
    """Per-lane minimum valid band offset (T, BT, LW) int32: lane
    (p*Ws + w) of sublane bt holds D - d_row of its alignment; dead
    lanes get Ws (never in band)."""
    wmin = jnp.broadcast_to(
        (jnp.int32(D) - d_rows).reshape(n_tiles, BT, P, 1),
        (n_tiles, BT, P, Ws)).reshape(n_tiles, BT, P * Ws)
    if P * Ws < LW:
        wmin = jnp.pad(wmin, ((0, 0), (0, 0), (0, LW - P * Ws)),
                       constant_values=Ws)
    return wmin


def sw_band_score_device(q, s, d_rows, subst_ext8, D: int,
                         gap_first: int, gap_extend: int,
                         interpret: bool = False):
    """Device-array variant.  q, s: (B, N) int32 rank arrays on device
    (q PAD-padded beyond qlen, s the virtual window), d_rows: (B,) int32
    per-row band sizes (<= D), B % BROWS == 0, N == pad_cols(N, D).
    Returns (B,) int32 best in-band local scores."""
    B, N = q.shape
    Np, W, BROWS, NC, JB = _plan(N, D)
    assert Np == N, (N, Np)
    n_tiles = B // BROWS
    if _XDROP and _LAYOUT != "lane":
        # the sublane A/B kernel has no X-drop implementation; running
        # it would silently produce exact-DP scores where the lane
        # layout produces X-drop scores (backend-determinism violation)
        raise NotImplementedError(
            "LAMBDA_SW_XDROP requires the default lane layout "
            "(LAMBDA_SWB_LAYOUT=sublane does not implement X-drop)")
    if _LAYOUT == "lane":
        Ws, P, LW, BT = _lane_geometry(D)
        subb = _band_image_lane(q, s, d_rows, subst_ext8, n_tiles, BT, P,
                                LW, D, Ws, N)
        wmin = _lane_wmin(d_rows, D, n_tiles, BT, P, Ws, LW)
        out = _score_band_lane(subb, wmin, n_tiles, N, Ws, LW, BT, NC, D,
                               int(gap_first), int(gap_extend), interpret,
                               x_drop=_XDROP)
    else:
        subb = _band_image_sub(q, s, d_rows, subst_ext8, n_tiles, BROWS,
                               D, W, N)
        wmin = jnp.broadcast_to(
            (jnp.int32(D) - d_rows).reshape(n_tiles, 1, BROWS),
            (n_tiles, 8, BROWS))
        out = _score_band_padded(subb, wmin, n_tiles, N, W, BROWS, NC, D,
                                 int(gap_first), int(gap_extend), interpret)
    return out.reshape(B)


def sw_band_score_pallas(q: np.ndarray, s: np.ndarray, d_rows: np.ndarray,
                         subst_ext8, gap_first: int, gap_extend: int,
                         interpret: bool = False) -> np.ndarray:
    """Host API: best banded local score per row.

    q: (B, Mq) int32 ranks (PAD rank = alphabet size); s: (B, Ns) the
    VIRTUAL windows (window position j maps to query position j - d for
    band offsets d in [0, D]); d_rows: per-row band sizes.
    """
    B, Mq = q.shape
    Ns = s.shape[1]
    D = int(d_rows.max()) if len(d_rows) else 0
    pad_rank = int(np.asarray(subst_ext8).shape[0]) - 1
    N, W, BROWS, _, _ = _plan(Ns, D)
    Bp = _ceil(max(B, 1), BROWS)

    qp, sp, dr, put = _pad_host_inputs(q, s, d_rows, N, Bp, pad_rank,
                                       interpret)
    out = sw_band_score_device(put(qp), put(sp), put(dr),
                               put(np.asarray(subst_ext8)), D,
                               gap_first, gap_extend, interpret)
    return np.asarray(out)[:B]


# ---------------------------------------------------------------------------
# Exact scalar reference (tests)
# ---------------------------------------------------------------------------


def sw_band_xdrop_reference(q, s, D: int, subst, gap_first: int,
                            gap_extend: int, x_drop: int, nc: int) -> int:
    """Scalar reference of the kernel's X-drop semantics
    (LAMBDA_SW_XDROP): exact banded DP, column-major, with the
    chunk-granular per-alignment termination — after every ``nc``
    window columns, if the column's running scores max(H, E, 0) over
    the band have fallen more than ``x_drop`` below the best so far
    (and the best is positive), the alignment is dead: remaining
    columns contribute nothing.  ``nc`` is the kernel's static column
    chunk (``_plan(...)[3]``)."""
    NEG = -(2 ** 24)
    M, N = len(q), len(s)
    H = np.zeros((M + 1, N + 1), dtype=np.int64)
    E = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    F = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    best = 0
    for j in range(1, N + 1):
        ilo = max(j - D, 1)
        ihi = min(j, M)
        for i in range(ilo, ihi + 1):
            d = j - i
            E[i, j] = max(E[i, j - 1] + gap_extend,
                          H[i, j - 1] + gap_first) if d > 0 else NEG
            F[i, j] = max(F[i - 1, j] + gap_extend,
                          H[i - 1, j] + gap_first) if d < D else NEG
            H[i, j] = max(0, H[i - 1, j - 1] + subst[q[i - 1], s[j - 1]],
                          E[i, j], F[i, j])
            best = max(best, H[i, j])
        if j % nc == 0 and best > 0:
            cur = 0
            for i in range(ilo, ihi + 1):
                cur = max(cur, H[i, j], E[i, j])
            if cur < best - x_drop:
                return int(best)
    return int(best)


def sw_band_reference(q, s, D: int, subst, gap_first: int,
                      gap_extend: int) -> int:
    """Naive banded local affine SW: only cells with j - i in [0, D]
    (0-based char indices) exist; out-of-band neighbors are -inf."""
    NEG = -(2 ** 24)
    M, N = len(q), len(s)
    H = np.zeros((M + 1, N + 1), dtype=np.int64)
    E = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    F = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    best = 0
    for i in range(1, M + 1):
        jlo = max(i, 1)          # d = j - i >= 0 (1-based: d = j - i)
        jhi = min(i + D, N)
        for j in range(jlo, jhi + 1):
            d = j - i
            E[i, j] = max(E[i, j - 1] + gap_extend,
                          H[i, j - 1] + gap_first) if d > 0 else NEG
            F[i, j] = max(F[i - 1, j] + gap_extend,
                          H[i - 1, j] + gap_first) if d < D else NEG
            H[i, j] = max(0, H[i - 1, j - 1] + subst[q[i - 1], s[j - 1]],
                          E[i, j], F[i, j])
            best = max(best, H[i, j])
    return int(best)
