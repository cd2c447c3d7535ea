"""Pallas TPU kernel for batched local Smith-Waterman scoring (pass 1).

This is the TPU-native hot kernel replacing the reference's SIMD-batched
score-only alignment pass (SeqAn2 ``_prepareAndRunSimdAlignment``,
``/root/reference/src/search_algo.hpp:1044-1134,1246``).  Design notes
(all choices below were measured on a real v5e chip):

* The per-cell substitution lookup ``S(q_i, s_j)`` is hostile to the VPU
  (a 2-D table gather per cell; as an XLA gather it ran at ~0.05 GCUPS).
  It is hoisted out of the DP entirely: a one-hot contraction on the MXU
  materializes the full substitution image
  ``SUB[b, j, i] = S(q[b,i], s[b,j])`` as int8 in HBM (~27 MACs/cell is
  ~free on the MXU), and the Pallas kernel streams it column by column.
* The DP runs in COLUMN order (over subject positions j) with the batch
  tile on the sublane axis and query positions on the lane axis.  The
  loop-carried F-gap recurrence along the query axis is solved per column
  with a max-plus doubling prefix scan (log2(M) lane-rolls) — exact, no
  lazy-F iteration:  ``F[i] = max_{k<=i} v[k] + (i-k)*ge`` via
  ``F = max(F, roll(F, s) + s*ge)`` for s = 1, 2, 4, ...
* Lane shifts use ``pltpu.roll`` (32-bit lanes only; int16 vector ops —
  rolls AND ``arith.maxsi`` on packed i16 — fail to legalize in Mosaic on
  v5e, so accumulation is int32).  Large batch tiles (BT up to 512) hide
  the dependent-op latency of the per-column chain (measured 24 -> 33
  GCUPS going from BT=128 to BT=512).
* Affine-gap convention matches the reference (search_algo.hpp:226-230):
  ``gap_first`` = open+extend added for a gap's first char, ``gap_extend``
  for each further char.
* Padding: trailing PAD rank in q/s scores -128 against everything, which
  provably cannot inflate the local-alignment maximum (every path through
  a pad cell is dominated by stopping before it — pad rows/cols are
  trailing, E/F only decay, and H >= 0), so the inner loop needs no
  masking at all.

Only the score pass runs here; the traceback pass for the few survivors
(search_algo.hpp:1296) stays on its own path (see ops/sw_xla.py).
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
# padded query lengths beyond this would blow the VMEM budget even at the
# minimum batch tile; sw_score_pallas raises so callers pick the
# host/XLA kernels (the production banded kernel in sw_band.py windows
# long queries and has no such cliff)
M_MAX = 16384

_BT_CAP = int(os.environ.get("LAMBDA_SW_BT", "512"))


def extend_matrix8(subst: np.ndarray) -> np.ndarray:
    """Add PAD row/col scoring -128; clip to int8 range."""
    a = subst.shape[0]
    out = np.full((a + 1, a + 1), PAD_SCORE8, dtype=np.int8)
    out[:a, :a] = np.clip(subst, -127, 127)
    return out


def ext8_from_ext32(ext32: np.ndarray) -> np.ndarray:
    """Convert an sw_xla.extend_matrix (int32, PAD row included) to int8."""
    a = ext32.shape[0] - 1
    return extend_matrix8(np.asarray(ext32)[:a, :a])


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def batch_tile(M: int) -> int:
    """Batch rows per kernel program: as large as VMEM comfortably allows
    (bigger tiles hide dependent-op latency), shrinking for long queries."""
    bt = (1 << 19) // M          # ~0.5-2 MB int32 state arrays
    bt = max(32, min(_BT_CAP, bt))
    return 1 << int(np.log2(bt))


def _chunk_cols(M: int, BT: int) -> int:
    """Subject columns per VMEM chunk (~2 MB int8 blocks)."""
    return max(2 * 1024 * 1024 // (BT * M), 8)


@functools.partial(jax.jit, static_argnames=("n_tiles", "BT"))
def _sub_image(q, s, subst_ext8, n_tiles, BT):
    """SUB[b, j, i] = S(q[b, i], s[b, j]) as int8, shaped (T, N, BT, M).

    One-hot contraction on the MXU: Prof = onehot(q) @ S, then
    SUB = Prof . onehot(s) over the alphabet axis.  bf16 accumulation is
    exact here: each output cell sums exactly one non-zero product of
    int8-range values.
    """
    B, M = q.shape
    N = s.shape[1]
    C = subst_ext8.shape[0]
    iota = jnp.arange(C, dtype=jnp.int32)
    ohq = (q[:, :, None] == iota).astype(jnp.bfloat16)          # (B, M, C)
    prof = jax.lax.dot_general(
        ohq, subst_ext8.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16)                     # (B, M, C)
    ohs = (s[:, :, None] == iota).astype(jnp.bfloat16)           # (B, N, C)
    sub = jax.lax.dot_general(
        ohs, prof, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16)                     # (B, N, M)
    sub = sub.astype(jnp.int8)
    sub = sub.reshape(n_tiles, BT, N, M).transpose(0, 2, 1, 3)   # (T,N,BT,M)
    return sub


def _make_kernel(NC: int, M: int, BT: int, n_chunks: int, gap_first: int,
                 gap_extend: int):
    neg = NEG32
    steps = []
    st = 1
    while st < M:
        steps.append(st)
        st *= 2

    def kernel(sub_ref, out_ref, H_ref, E_ref, best_ref):
        def roll1(x, s):
            # circular lane-shift by s; the first s lanes carry junk that
            # every consumer overrides via masks/added constants.
            # (pltpu.roll measures the same as a concat of slices; it only
            # legalizes for 32-bit lanes, which this kernel always is)
            return pltpu.roll(x, shift=s, axis=1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, M), dimension=1)
        m0 = lane == 0
        ge = jnp.int32(gap_extend)
        gf = jnp.int32(gap_first)
        # c_first[m] = gap_first for m>=1, -inf at m=0 (F source boundary)
        c_first = jnp.where(m0, jnp.int32(neg), gf)
        # per-doubling-step increment, doubling as wraparound kill
        c_steps = [jnp.where(lane < s, jnp.int32(neg),
                             jnp.int32(max(s * gap_extend, neg)))
                   for s in steps]

        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            H_ref[:] = jnp.zeros((BT, M), jnp.int32)
            E_ref[:] = jnp.full((BT, M), jnp.int32(neg))
            best_ref[:] = jnp.zeros((BT, M), jnp.int32)

        def body(j, _):
            H = H_ref[:]
            subcol = sub_ref[0, j, :, :].astype(jnp.int32)
            E = jnp.maximum(E_ref[:] + ge, H + gf)
            Hup = jnp.where(m0, jnp.int32(0), roll1(H, 1))
            Htmp = jnp.maximum(jnp.maximum(Hup + subcol, E), jnp.int32(0))
            F = roll1(Htmp, 1) + c_first
            for s, cs in zip(steps, c_steps):
                F = jnp.maximum(F, roll1(F, s) + cs)
            Hn = jnp.maximum(Htmp, F)
            H_ref[:] = Hn
            E_ref[:] = E
            best_ref[:] = jnp.maximum(best_ref[:], Hn)
            return 0

        jax.lax.fori_loop(0, NC, body, 0)

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[0, 0, :] = jnp.max(best_ref[:], axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "N", "M", "BT", "gap_first",
                                    "gap_extend", "interpret"))
def _score_padded(sub, n_tiles, N, M, BT, gap_first, gap_extend, interpret):
    NC = _chunk_cols(M, BT)
    assert N % NC == 0, (N, NC)
    n_chunks = N // NC
    kernel = _make_kernel(NC, M, BT, n_chunks, gap_first, gap_extend)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, BT), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, NC, BT, M), lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, BT), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, M), jnp.int32) for _ in range(3)],
        interpret=interpret,
    )(sub)
    return out[:, 0, :]


def sw_score_device(q, s, subst_ext8, gap_first: int, gap_extend: int,
                    interpret: bool = False):
    """Device-array variant: q (B, M) int32 on device, padded to tile
    multiples already (B % BT == 0, M % 128 == 0, N % chunk == 0).
    Returns device (B,) int32.  Used by fused pipelines/benchmarks."""
    B, M = q.shape
    BT = batch_tile(M)
    n_tiles = B // BT
    sub = _sub_image(q, s, subst_ext8, n_tiles, BT)
    out = _score_padded(sub, n_tiles, s.shape[1], M, BT, int(gap_first),
                        int(gap_extend), interpret)
    return out.reshape(B)


def sw_score_pallas(q: np.ndarray, s: np.ndarray, subst_ext8,
                    gap_first: int, gap_extend: int,
                    interpret: bool = False) -> np.ndarray:
    """Best local-alignment score per row.  q: (B, Mq) int32 rank arrays
    (PAD rank = alphabet size), s: (B, Ns).  Returns (B,) int32 numpy."""
    B, Mq = q.shape
    Ns = s.shape[1]
    if Mq > M_MAX:
        raise ValueError(
            f"sw_score_pallas: query length {Mq} > M_MAX={M_MAX} exceeds "
            "the VMEM budget; use the banded kernel (ops/sw_band.py) or "
            "the host/XLA backends")
    pad_rank = int(np.asarray(subst_ext8).shape[0]) - 1
    M = max(_ceil(Mq, 128), 128)
    BT = batch_tile(M)
    N = _ceil(Ns, _chunk_cols(M, BT))
    Bp = _ceil(max(B, 1), BT)

    qp = np.full((Bp, M), pad_rank, dtype=np.int32)
    qp[:B, :Mq] = q
    sp = np.full((Bp, N), pad_rank, dtype=np.int32)
    sp[:B, :Ns] = s

    if interpret:
        # interpret mode must lower for the CPU platform (the TPU plugin
        # otherwise captures default placement and breaks the interpreter)
        dev = jax.devices("cpu")[0]
        put = functools.partial(jax.device_put, device=dev)
    else:
        put = jnp.asarray
    out = sw_score_device(put(qp), put(sp), put(np.asarray(subst_ext8)),
                          gap_first, gap_extend, interpret)
    return np.asarray(out)[:B]
