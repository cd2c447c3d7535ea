"""Smith-Waterman local alignment with affine gaps as batched anti-diagonal
wavefront DP in XLA (device), plus host traceback.

TPU-native replacement of the reference's hot kernel — SeqAn2's
SIMD-batched `_prepareAndRunSimdAlignment`
(``/root/reference/src/search_algo.hpp:1044-1134``): the reference packs
8/16 alignments into SSE4/AVX2 int16 lanes and runs unbanded DP; here a
whole batch of alignments advances one anti-diagonal per step, with the
batch on the vector lanes and the diagonal on the sublane axis.  The same
two-pass structure is kept: a score-only pass over all candidates
(`sw_score_batch`), then a direction-emitting pass over survivors
(`sw_align_batch`, search_algo.hpp:1246/1296) whose packed direction bits
are walked on the host (`traceback`).

Conventions (identical to the reference's scheme setup,
search_algo.hpp:226-230):
* ``gap_first``: score added for the FIRST char of a gap (open+extend)
* ``gap_extend``: score added for every further gap char
* free end gaps / local alignment: best cell anywhere, H floored at 0.

Padding: callers pad q/s with the PAD rank (== alphabet size); the
substitution matrix is extended so PAD scores NEG_SCORE against
everything, which keeps padded regions at H == 0 without branching.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NEG = -(2 ** 24)  # effectively -inf for int32 accumulation
PAD_SCORE = -(2 ** 20)

# direction encoding (2 bits H-source + 1 bit E-extend + 1 bit F-extend)
H_STOP, H_DIAG, H_FROME, H_FROMF = 0, 1, 2, 3
E_EXT_BIT, F_EXT_BIT = 4, 8


def extend_matrix(subst: np.ndarray) -> np.ndarray:
    """Add a PAD row/column scoring PAD_SCORE against everything."""
    a = subst.shape[0]
    out = np.full((a + 1, a + 1), PAD_SCORE, dtype=np.int32)
    out[:a, :a] = subst
    return out


def _scan_core(q, s, subst_ext, gap_first, gap_extend, with_dirs: bool,
               band_d=None):
    """q: (B, M) int32 (PAD-padded); s: (B, N) int32; subst_ext device array.

    band_d: optional (B,) int32 per-row diagonal band sizes — restricts
    the DP to cells with j - i in [0, band_d[b]] (0-based chars), the
    banded semantics shared with ops/sw_band.py; None = full rectangle.

    Returns (best, best_i, best_j[, dirs]) where best_i/best_j are 1-based
    inclusive end coordinates of the best cell, and dirs is
    (D, B, M+1) uint8 per-antidiagonal direction codes (d = 2..M+N).
    """
    B, M = q.shape
    N = s.shape[1]
    A1 = subst_ext.shape[0]

    prof = subst_ext[q]  # (B, M, A1) profile: prof[b, i, c] = S(q_i, c)

    i_idx = jnp.arange(M + 1, dtype=jnp.int32)  # DP row index (0..M)

    def shift_down(x):
        # x[:, i] -> x[:, i-1] (index 0 gets NEG)
        return jnp.concatenate(
            [jnp.full((B, 1), NEG, dtype=x.dtype), x[:, :-1]], axis=1)

    def step(carry, d):
        H1, H2, E1, F1, best, bi, bj = carry
        # E(i, j) = max(E(i, j-1)+ge, H(i, j-1)+gf); (i, j-1) is diag d-1, idx i
        E = jnp.maximum(E1 + gap_extend, H1 + gap_first)
        # F(i, j) = max(F(i-1, j)+ge, H(i-1, j)+gf); (i-1, j) is diag d-1, idx i-1
        F1s = shift_down(F1)
        H1s = shift_down(H1)
        F = jnp.maximum(F1s + gap_extend, H1s + gap_first)

        # substitution score S(q_i, s_{d-i}) for i in 1..M
        j_of_i = d - i_idx  # (M+1,)
        s_col = jnp.take_along_axis(
            s, jnp.clip(j_of_i[None, 1:] - 1, 0, N - 1), axis=1)  # (B, M)
        sub = jnp.take_along_axis(
            prof, s_col[:, :, None].astype(jnp.int32), axis=2)[:, :, 0]  # (B, M)
        sub = jnp.concatenate([jnp.full((B, 1), NEG, jnp.int32), sub], axis=1)

        H2s = shift_down(H2)
        diag = H2s + sub

        valid = (i_idx >= 1) & (i_idx <= M) & (j_of_i >= 1) & (j_of_i <= N)
        valid = valid[None, :]
        if band_d is not None:
            # 0-based char diagonal: (j-1) - (i-1) = d - 2*i
            bdiag = (d - 2 * i_idx)[None, :]
            valid = valid & (bdiag >= 0) & (bdiag <= band_d[:, None])
        E = jnp.where(valid, E, NEG)
        F = jnp.where(valid, F, NEG)
        diag = jnp.where(valid, diag, NEG)

        H = jnp.maximum(jnp.maximum(diag, 0), jnp.maximum(E, F))
        H = jnp.where(valid, H, 0)

        # best-cell tracking: first maximum in (d, i) scan order
        row_best_i = jnp.argmax(H, axis=1).astype(jnp.int32)  # first max
        row_best = jnp.take_along_axis(H, row_best_i[:, None], axis=1)[:, 0]
        upd = row_best > best
        best = jnp.where(upd, row_best, best)
        bi = jnp.where(upd, row_best_i, bi)
        bj = jnp.where(upd, d - row_best_i, bj)

        out = None
        if with_dirs:
            # H source priority on ties: diag > E > F (deterministic)
            code = jnp.zeros((B, M + 1), dtype=jnp.uint8)
            code = jnp.where((H > 0) & (H == F), jnp.uint8(H_FROMF), code)
            code = jnp.where((H > 0) & (H == E), jnp.uint8(H_FROME), code)
            code = jnp.where((H > 0) & (H == diag), jnp.uint8(H_DIAG), code)
            e_ext = (E1 + gap_extend) >= (H1 + gap_first)
            f_ext = (F1s + gap_extend) >= (H1s + gap_first)
            code = code | jnp.where(e_ext, jnp.uint8(E_EXT_BIT), jnp.uint8(0))
            code = code | jnp.where(f_ext, jnp.uint8(F_EXT_BIT), jnp.uint8(0))
            out = code

        return (H, H1, E, F, best, bi, bj), out

    # anchor to inputs' device-variance so scan carry types are stable
    # under shard_map (x + 0 keeps values)
    anchor = (q[:, 0] * 0 + s[:, 0] * 0).astype(jnp.int32)  # (B,)
    H0 = jnp.zeros((B, M + 1), dtype=jnp.int32) + anchor[:, None]
    E0 = jnp.full((B, M + 1), NEG, dtype=jnp.int32) + anchor[:, None]
    z = jnp.zeros(B, jnp.int32) + anchor
    init = (H0, H0, E0, E0, z, z, z)

    ds = jnp.arange(2, M + N + 1, dtype=jnp.int32)
    carry, dirs = jax.lax.scan(step, init, ds)
    _, _, _, _, best, bi, bj = carry
    if with_dirs:
        return best, bi, bj, dirs
    return best, bi, bj


@functools.partial(jax.jit, static_argnames=())
def sw_score_batch(q, s, subst_ext, gap_first, gap_extend, band_d=None):
    """Score-only pass.  Returns (best, best_i, best_j); best_i/best_j are
    1-based inclusive coordinates of the optimum cell."""
    return _scan_core(q, s, subst_ext, gap_first, gap_extend,
                      with_dirs=False, band_d=band_d)


@functools.partial(jax.jit, static_argnames=())
def sw_align_batch(q, s, subst_ext, gap_first, gap_extend, band_d=None):
    """Direction-emitting pass for traceback."""
    return _scan_core(q, s, subst_ext, gap_first, gap_extend,
                      with_dirs=True, band_d=band_d)


@functools.partial(jax.jit, static_argnames=("x_drop",))
def sw_xdrop_score_batch(q, s, subst_ext, gap_first, gap_extend,
                         band_d, nc, x_drop: int):
    """Banded score pass with the chunk-granular X-drop semantics of
    ``sw_band.sw_band_xdrop_reference`` (the LAMBDA_SW_XDROP contract
    shared by the Pallas lane kernel and the native host kernel): after
    every ``nc[b]`` columns, alignment ``b`` is dead once
    ``max(H, E, 0)`` over the column's band has fallen more than
    ``x_drop`` below its best-so-far (and best > 0); a dead alignment's
    best is frozen.  Pure-XLA fallback — no early exit (static control
    flow), identical scores.

    Column scan instead of ``_scan_core``'s anti-diagonals: the X-drop
    check is column-granular.  The in-column F recurrence
    ``F[i] = max(F[i-1]+ge, H[i-1]+gf)`` resolves without a sequential
    inner loop as a max-plus prefix: with ``G = H without F`` (the zero
    floor makes ``H = max(G, F)`` and ``ge >= gf`` drops the
    ``F[i-1]+gf`` candidate), ``F[i] = i*ge + cummax(c - t*ge)[i]``
    where ``c_t = G[t-1] + gf``.

    Returns best (B,) int32.
    """
    B, M = q.shape
    N = s.shape[1]
    prof = subst_ext[q]  # (B, M, A1): prof[b, i, c] = S(q_i, c)
    i_idx = jnp.arange(M + 1, dtype=jnp.int32)[None, :]   # (1, M+1)
    ge = jnp.int32(gap_extend)
    gf = jnp.int32(gap_first)
    iexts = (jnp.arange(M + 1, dtype=jnp.int32) * ge)[None, :]
    nc = jnp.maximum(nc, 1)

    def step(carry, xs):
        Hp, Ep, best, dead = carry          # (B, M+1) prev-column finals
        j, s_col = xs                       # scalar, (B,)
        d = j - i_idx                       # diagonal (1-based i == row)
        inb = (d >= 0) & (d <= band_d[:, None]) \
            & (i_idx >= 1) & (i_idx <= M)
        # E(i, j) = max(E(i, j-1)+ge, H(i, j-1)+gf); invalid at d == 0
        E = jnp.maximum(Ep + ge, Hp + gf)
        E = jnp.where(inb & (d > 0), E, NEG)
        # substitution S(q_i, s_j) for i in 1..M
        sub = jnp.take_along_axis(
            prof, s_col[:, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        sub = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), sub], axis=1)
        diag = jnp.concatenate(
            [jnp.full((B, 1), 0, jnp.int32), Hp[:, :-1]], axis=1) + sub
        G = jnp.maximum(jnp.maximum(diag, 0), E)            # H without F
        G = jnp.where(inb, G, 0)       # out-of-band H reads as 0 (ref)
        # F via max-plus prefix; candidates only where F is defined
        # (in band and d < D — the reference's F guard)
        f_ok = inb & (d < band_d[:, None])
        c = jnp.concatenate(
            [jnp.full((B, 1), 0, jnp.int32), G[:, :-1]], axis=1) + gf
        u = jnp.where(f_ok, c, NEG) - iexts
        F = jnp.where(f_ok, jax.lax.cummax(u, axis=1) + iexts, NEG)
        H = jnp.where(inb, jnp.maximum(G, F), 0)
        colbest = jnp.max(H, axis=1)
        best = jnp.where(dead, best, jnp.maximum(best, colbest))
        # chunk-granular death check (after the column's best update)
        cur = jnp.maximum(
            jnp.max(jnp.where(inb, jnp.maximum(H, E), NEG), axis=1), 0)
        at_chunk = (j % nc) == 0
        dead = dead | (at_chunk & (best > 0) & (cur < best - x_drop))
        return (H, E, best, dead), None

    anchor = (q[:, 0] * 0 + s[:, 0] * 0).astype(jnp.int32)  # (B,)
    H0 = jnp.zeros((B, M + 1), dtype=jnp.int32) + anchor[:, None]
    E0 = jnp.full((B, M + 1), NEG, dtype=jnp.int32) + anchor[:, None]
    z = jnp.zeros(B, jnp.int32) + anchor
    init = (H0, E0, z, z.astype(bool))
    js = jnp.arange(1, N + 1, dtype=jnp.int32)
    # s columns as scan inputs: s_cols[j-1] = s[:, j-1]
    (_, _, best, _), _ = jax.lax.scan(step, init, (js, s.T))
    return best


def traceback(dirs: np.ndarray, b: int, bi: int, bj: int):
    """Walk packed directions for alignment ``b`` from 1-based end cell
    (bi, bj) back to the local start.

    dirs: (D, B, M+1) uint8 from sw_align_batch (host numpy).
    Returns (q_start0, s_start0, ops) where ops is a list of
    ('M'|'D'|'I', run_length) from alignment start to end.
    'D' consumes subject only (gap in query row), 'I' consumes query only —
    matching the reference's CIGAR orientation (search_output.hpp:146-177).
    """
    i, j = bi, bj
    ops: list[str] = []
    state = "H"
    while True:
        code = int(dirs[i + j - 2, b, i]) if (i + j) >= 2 else 0
        if state == "H":
            h = code & 3
            if h == H_STOP or i <= 0 or j <= 0:
                break
            if h == H_DIAG:
                ops.append("M")
                i -= 1
                j -= 1
            elif h == H_FROME:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            ops.append("D")
            ext = bool(code & E_EXT_BIT)
            j -= 1
            state = "E" if ext else "H"
        else:  # F
            ops.append("I")
            ext = bool(code & F_EXT_BIT)
            i -= 1
            state = "F" if ext else "H"

    ops.reverse()
    # run-length encode
    rle: list[tuple[str, int]] = []
    for op in ops:
        if rle and rle[-1][0] == op:
            rle[-1] = (op, rle[-1][1] + 1)
        else:
            rle.append((op, 1))
    return i, j, rle


# ---------------------------------------------------------------------------
# Reference implementation for tests (slow, exact)
# ---------------------------------------------------------------------------


def sw_reference(q: np.ndarray, s: np.ndarray, subst: np.ndarray,
                 gap_first: int, gap_extend: int) -> int:
    """Naive O(MN) local affine SW, returns the optimal score."""
    M, N = len(q), len(s)
    H = np.zeros((M + 1, N + 1), dtype=np.int64)
    E = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    F = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    best = 0
    for i in range(1, M + 1):
        for j in range(1, N + 1):
            E[i, j] = max(E[i, j - 1] + gap_extend, H[i, j - 1] + gap_first)
            F[i, j] = max(F[i - 1, j] + gap_extend, H[i - 1, j] + gap_first)
            H[i, j] = max(0, H[i - 1, j - 1] + subst[q[i - 1], s[j - 1]],
                          E[i, j], F[i, j])
            best = max(best, H[i, j])
    return int(best)


def score_of_ops(q, s, q0, s0, ops, subst, gap_first, gap_extend) -> int:
    """Recompute an alignment's score from its ops (self-check)."""
    score = 0
    i, j = q0, s0
    for op, run in ops:
        if op == "M":
            for _ in range(run):
                score += int(subst[q[i], s[j]])
                i += 1
                j += 1
        elif op == "D":
            score += gap_first + (run - 1) * gap_extend
            j += run
        else:
            score += gap_first + (run - 1) * gap_extend
            i += run
    return score
