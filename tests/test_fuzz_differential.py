"""Bounded randomized differential fuzz of the extension backends.

A fixed-seed slice of the round-3 stress campaign (300 trials/campaign
offline, zero failures): random substitution matrices, gap schemes,
lengths, bands and content — every backend must equal the scalar banded
DP oracle (`sw_band_reference` / `sw_band_xdrop_reference`), and both
traceback paths must re-score to the oracle score.

Array shapes are FIXED (B=8, M=48, N=56) so XLA compiles each jitted
function once; all variability lives in lengths, bands and content.
Pallas interpret mode is exercised on a couple of trials only (it
emulates the kernel grid in Python and is slow).

Reference semantics being pinned: the two-pass SIMD extension
(search_algo.hpp:1246,1296) with the band the widener intends
(search_misc.hpp:46-50; PARITY.md deviation 6).
"""

import numpy as np
import pytest
import jax

from lambda_tpu import native
from lambda_tpu.ops import sw_band, sw_pallas, sw_xla

B, M, N = 8, 48, 56
CPU = jax.devices("cpu")[0]


def _case(seed: int):
    rng = np.random.default_rng(seed)
    A = int(rng.choice([4, 6, 16, 27]))
    subst = rng.integers(-6, 3, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, rng.integers(1, 9, size=A))
    if rng.random() < 0.1:
        subst = np.full((A, A), -abs(int(rng.integers(1, 5))), np.int32)
    gap_extend = -int(rng.integers(1, 5))
    gap_first = gap_extend - int(rng.integers(0, 15))
    Dmax = int(rng.choice([3, 9, 13]))
    d_rows = rng.integers(1, Dmax + 1, size=B).astype(np.int32)
    d_rows[0] = Dmax
    qlens = rng.integers(1, M + 1, size=B)
    slens = rng.integers(1, N + 1, size=B)
    q = np.full((B, M), A, np.int32)
    s = np.full((B, N), A, np.int32)
    for b in range(B):
        q[b, :qlens[b]] = rng.integers(0, A, size=qlens[b])
        s[b, :slens[b]] = rng.integers(0, A, size=slens[b])
        if rng.random() < 0.5:
            L = min(int(qlens[b]), int(slens[b]), 30)
            off = int(rng.integers(0, max(1, slens[b] - L + 1)))
            s[b, off:off + L] = q[b, :L]
    return A, subst, gap_first, gap_extend, d_rows, q, s


def _lists(q, s, A):
    return ([q[b][q[b] < A] for b in range(B)],
            [s[b][s[b] < A] for b in range(B)])


@pytest.mark.parametrize("seed", range(200, 220))
def test_fuzz_banded_backends_match_oracle(seed):
    A, subst, gf, ge, d_rows, q, s = _case(seed)
    q_list, s_list = _lists(q, s, A)
    want = np.array([sw_band.sw_band_reference(q_list[b], s_list[b],
                                               int(d_rows[b]), subst, gf, ge)
                     for b in range(B)], np.int64)

    if native.get_lib() is not None:
        got_n = native.sw_score_batch(q_list, s_list, subst, gf, ge,
                                      band=d_rows)
        assert np.array_equal(got_n, want), seed

        sc, traces = native.sw_traceback_batch(q_list, s_list, subst,
                                               gf, ge, band=d_rows)
        assert np.array_equal(sc, want), seed
        for b in range(B):
            if traces[b] is None:
                assert want[b] == 0, (seed, b)
                continue
            q0, s0, ops = traces[b]
            assert sw_xla.score_of_ops(q_list[b], s_list[b], q0, s0, ops,
                                       subst, gf, ge) == want[b], (seed, b)

    e1 = sw_xla.extend_matrix(subst)
    dq, ds, de, dd = (jax.device_put(x, CPU) for x in (q, s, e1, d_rows))
    best, bi, bj, dirs = (np.asarray(x) for x in sw_xla.sw_align_batch(
        dq, ds, de, gf, ge, band_d=dd))
    assert np.array_equal(best.astype(np.int64), want), seed
    for b in range(B):
        if best[b] <= 0:
            continue
        q0, s0, ops = sw_xla.traceback(dirs, b, int(bi[b]), int(bj[b]))
        assert sw_xla.score_of_ops(q_list[b], s_list[b], q0, s0, ops,
                                   subst, gf, ge) == want[b], (seed, b)


@pytest.mark.parametrize("seed", range(300, 315))
def test_fuzz_xdrop_backends_match_oracle(seed):
    X = 17
    A, subst, gf, ge, d_rows, q, s = _case(seed)
    q_list, s_list = _lists(q, s, A)
    D = int(d_rows.max())
    nc = sw_band._plan(N, D)[3]
    want = np.array([sw_band.sw_band_xdrop_reference(
        q_list[b], s_list[b], int(d_rows[b]), subst, gf, ge,
        x_drop=X, nc=nc) for b in range(B)], np.int64)

    if native.get_lib() is not None:
        got_n = native.sw_score_batch(
            q_list, s_list, subst, gf, ge, band=d_rows,
            nc=np.full(B, nc, np.int32), x_drop=X)
        assert np.array_equal(got_n, want), seed

    e1 = sw_xla.extend_matrix(subst)
    got_x = sw_xla.sw_xdrop_score_batch(
        jax.device_put(q, CPU), jax.device_put(s, CPU),
        jax.device_put(e1, CPU), gf, ge, jax.device_put(d_rows, CPU),
        jax.device_put(np.full(B, nc, np.int32), CPU), X)
    assert np.array_equal(np.asarray(got_x).astype(np.int64), want), seed


@pytest.mark.parametrize("seed", [201, 307])
def test_fuzz_pallas_interpret_matches_oracle(seed, monkeypatch):
    """Two fuzz cases through the pallas lane kernel in interpret mode
    (tiny tiles; full tiles take hours in the Python emulator)."""
    monkeypatch.setattr(sw_band, "_BT_CAP", 8)
    monkeypatch.setattr(sw_band, "_BTL_CAP", 128)
    A, subst, gf, ge, d_rows, q, s = _case(seed)
    q_list, s_list = _lists(q, s, A)
    e8 = sw_pallas.extend_matrix8(subst)
    got = sw_band.sw_band_score_pallas(q, s, d_rows, e8, gf, ge,
                                       interpret=True)
    want = [sw_band.sw_band_reference(q_list[b], s_list[b], int(d_rows[b]),
                                      subst, gf, ge) for b in range(B)]
    assert list(got) == want, seed
