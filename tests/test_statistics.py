import math

import numpy as np
import pytest

from lambda_tpu import scoring, statistics as st


def test_ka_lookup_blosum62_defaults():
    # protein defaults: gapOpen -11, gapExtend -1
    lam, K, H, alpha, beta = st.get_ka_params("blosum62", -11, -1)
    assert lam == pytest.approx(0.267)
    assert K == pytest.approx(0.041)


def test_ka_lookup_blastn_defaults():
    # nucleotide defaults: match 2, mismatch -3, gapOpen -5, gapExtend -2
    lam, K, H, alpha, beta = st.get_ka_params("simple", -5, -2, match=2, mismatch=-3)
    assert lam == pytest.approx(0.625)
    assert K == pytest.approx(0.41)


def test_ka_missing_raises():
    with pytest.raises(st.KarlinAltschulError):
        st.get_ka_params("blosum62", -100, -100)
    with pytest.raises(st.KarlinAltschulError):
        st.get_ka_params("simple", -5, -2, match=7, mismatch=-13)


def test_ungapped_lambda_consistency_blosum62():
    # the analytic ungapped lambda for BLOSUM62 with Robinson frequencies
    # must match the table's ungapped row (0.3176) closely
    lam, H = st.ungapped_lambda_K_H(scoring.BLOSUM62[:27, :27], st.robinson_freqs_aa27())
    assert lam == pytest.approx(0.3176, abs=0.002)
    assert H == pytest.approx(0.4012, abs=0.01)


def test_ungapped_blastn_exact_ncbi_values():
    # NCBI blast_stat.c documents these exact ungapped values
    lam, K, H, alpha, beta = st.blastn_ungapped_params(1, -2)
    assert lam == pytest.approx(1.33, abs=0.005)
    assert K == pytest.approx(0.621, abs=0.001)
    lam, K, H, alpha, beta = st.blastn_ungapped_params(1, -3)
    assert lam == pytest.approx(1.374, abs=0.001)
    assert K == pytest.approx(0.711, abs=0.001)
    # the {-1,+1} closed form: K = (p- - p+)^2 / p-
    lam, K, H, alpha, beta = st.blastn_ungapped_params(1, -1)
    assert K == pytest.approx(1 / 3, abs=1e-6)
    # gcd rescaling: (2,-4) is (1,-2) at half-lambda, same K
    lam2, K2, H2, *_ = st.blastn_ungapped_params(2, -4)
    assert K2 == pytest.approx(0.621, abs=0.001)
    assert lam2 == pytest.approx(1.3327 / 2, abs=0.001)


def test_bit_score_and_evalue():
    params = st.get_ka_params("blosum62", -11, -1)
    bs = st.bit_score(100, params)
    # (0.267*100 - ln 0.041)/ln2 = (26.7 + 3.194)/0.6931
    assert bs == pytest.approx((0.267 * 100 - math.log(0.041)) / math.log(2))
    ev = st.e_value(100, 200, 1_000_000, params)
    assert ev == pytest.approx(0.041 * 200 * 1e6 * math.exp(-26.7))


def test_length_adjustment_sane():
    params = st.get_ka_params("blosum62", -11, -1)
    adj = st.length_adjustment(10_000_000, 250, params)
    # NCBI values for this regime are ~115-145
    assert 80 < adj < 200
    # monotone-ish in query length
    adj_short = st.length_adjustment(10_000_000, 50, params)
    assert adj_short < adj
    # tiny db
    assert st.length_adjustment(100, 10, params) >= 0


def test_evaluer_cache_and_translated():
    params = st.get_ka_params("blosum62", -11, -1)
    ev = st.EValuer(params, db_total_length=1_000_000, q_is_translated=True)
    # translated query length divided by 3 (search_misc.hpp:70)
    assert ev.effective_qlen(300) == 100
    e1 = ev.e_value(80, 300)
    e2 = ev.e_value(80, 300)
    assert e1 == e2
    assert len(ev._adj_cache) == 1


def test_karlin_k_zero_freq_extremes():
    # zero-frequency letters whose scores are the matrix min/max must not
    # mis-anchor the gcd rescale (regression: _regcd assert fired when
    # the lattice gcd did not divide the unattained matrix minimum)
    m = np.array([
        [ 2, -4, -5],
        [-4,  2, -5],
        [-5, -5,  7],
    ], dtype=np.int32)
    freqs = np.array([0.5, 0.5, 0.0])
    lam, H = st.ungapped_lambda_K_H(m, freqs)
    # attained lattice {-4, 2} has gcd 2, but the unattained matrix min
    # -5 is odd: pre-fix this tripped _regcd's divisibility assert
    K = st.karlin_lh_to_k(m, freqs, lam, H)
    m2 = np.array([
        [ 1, -2, -7],
        [-2,  1, -7],
        [-7, -7,  9],
    ], dtype=np.int32)
    lam2, H2 = st.ungapped_lambda_K_H(m2, freqs)
    K2 = st.karlin_lh_to_k(m2, freqs, lam2, H2)
    assert 0 < K2 < 1
    assert math.isfinite(K)
