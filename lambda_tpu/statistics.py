"""Karlin-Altschul statistics: lambda/K/H/alpha/beta parameters, length
adjustment, bit scores and e-values.

TPU-native equivalent of the SeqAn2 blast-statistics module the reference
relies on (``/root/reference/src/search_misc.hpp:56-80``
computeEValueThreadSafe, ``/root/reference/src/search_algo.hpp:232-233``
validity check, ``:1258/:1270`` computeBitScore/eValue calls).

The gapped parameter tables are the NCBI blast_stat.c tables (which SeqAn2
copied); rows are (gap_open, gap_extend, lambda, K, H, alpha, beta) with gap
costs as *positive* magnitudes in BLAST convention (gap of length L costs
open + L*extend).  The ungapped row of each table is parameterized by
(0, 0, ...).

All computation here is host-side float64: these are per-(scheme, qlen)
cached scalars, never hot-path work (mirrors the reference's thread_local
cache, search_misc.hpp:66).
"""

from __future__ import annotations

import functools
import math

import numpy as np

# ---------------------------------------------------------------------------
# Parameter tables (NCBI blast_stat.c)
# rows: (open, extend, lambda, K, H, alpha, beta); (0,0,...) = ungapped
# ---------------------------------------------------------------------------

BLOSUM62_VALUES = [
    (0, 0, 0.3176, 0.134, 0.4012, 0.7916, -3.2),
    (11, 2, 0.297, 0.082, 0.27, 1.1, -10),
    (10, 2, 0.291, 0.075, 0.23, 1.3, -15),
    (9, 2, 0.279, 0.058, 0.19, 1.5, -19),
    (8, 2, 0.264, 0.045, 0.15, 1.8, -26),
    (7, 2, 0.239, 0.027, 0.10, 2.5, -46),
    (6, 2, 0.201, 0.012, 0.061, 3.3, -58),
    (13, 1, 0.292, 0.071, 0.23, 1.2, -11),
    (12, 1, 0.283, 0.059, 0.19, 1.5, -19),
    (11, 1, 0.267, 0.041, 0.14, 1.9, -30),
    (10, 1, 0.243, 0.024, 0.10, 2.5, -44),
    (9, 1, 0.206, 0.010, 0.052, 4.0, -87),
]

BLOSUM45_VALUES = [
    (0, 0, 0.2291, 0.0924, 0.2514, 0.9113, -5.7),
    (13, 3, 0.207, 0.049, 0.14, 1.5, -22),
    (12, 3, 0.199, 0.039, 0.11, 1.8, -34),
    (11, 3, 0.190, 0.031, 0.095, 2.0, -38),
    (10, 3, 0.179, 0.023, 0.075, 2.4, -51),
    (16, 2, 0.210, 0.051, 0.14, 1.5, -24),
    (15, 2, 0.203, 0.041, 0.12, 1.7, -31),
    (14, 2, 0.195, 0.032, 0.10, 1.9, -36),
    (13, 2, 0.185, 0.024, 0.084, 2.2, -45),
    (12, 2, 0.171, 0.016, 0.061, 2.8, -65),
    (19, 1, 0.205, 0.040, 0.11, 1.9, -43),
    (18, 1, 0.198, 0.032, 0.10, 2.0, -43),
    (17, 1, 0.189, 0.024, 0.079, 2.4, -57),
    (16, 1, 0.176, 0.016, 0.063, 2.8, -67),
]

BLOSUM80_VALUES = [
    (0, 0, 0.3430, 0.177, 0.6568, 0.5222, -1.6),
    (25, 2, 0.342, 0.17, 0.66, 0.52, -1.6),
    (13, 2, 0.336, 0.15, 0.57, 0.59, -3),
    (9, 2, 0.319, 0.11, 0.42, 0.76, -6),
    (8, 2, 0.308, 0.090, 0.35, 0.89, -9),
    (7, 2, 0.293, 0.070, 0.27, 1.1, -14),
    (6, 2, 0.268, 0.045, 0.19, 1.4, -19),
    (11, 1, 0.314, 0.095, 0.35, 0.90, -9),
    (10, 1, 0.299, 0.071, 0.27, 1.1, -14),
    (9, 1, 0.279, 0.048, 0.20, 1.4, -19),
]

# Nucleotide (reward, -penalty) tables.  NCBI lists gap costs directly in
# the same convention.  Keys are (match, mismatch) with mismatch negative.
BLASTN_VALUES = {
    (1, -5): [
        (3, 3, 1.39, 0.747, 1.38, 1.00, 0),
    ],
    (1, -4): [
        (1, 2, 1.36, 0.67, 1.2, 1.1, 0),
        (0, 2, 1.26, 0.43, 0.90, 1.4, -1),
        (2, 1, 1.35, 0.61, 1.1, 1.2, -1),
        (1, 1, 1.22, 0.35, 0.72, 1.7, -3),
    ],
    (2, -7): [
        (2, 4, 0.68, 0.67, 1.2, 0.55, -1),
        (0, 4, 0.63, 0.43, 0.90, 0.70, -2),
        (4, 2, 0.675, 0.62, 1.1, 0.6, -1),
        (2, 2, 0.61, 0.35, 0.72, 1.7, -3),
    ],
    (1, -3): [
        (2, 2, 1.37, 0.70, 1.2, 1.1, 0),
        (1, 2, 1.35, 0.64, 1.1, 1.2, -1),
        (0, 2, 1.25, 0.42, 0.83, 1.5, -2),
        (2, 1, 1.34, 0.60, 1.1, 1.2, -1),
        (1, 1, 1.21, 0.34, 0.71, 1.7, -2),
    ],
    (2, -5): [
        (2, 4, 0.67, 0.59, 1.1, 0.6, -1),
        (0, 4, 0.62, 0.39, 0.78, 0.8, -2),
        (4, 2, 0.67, 0.61, 1.0, 0.65, -2),
        (2, 2, 0.56, 0.32, 0.59, 0.95, -4),
    ],
    (1, -2): [
        (2, 2, 1.33, 0.62, 1.1, 1.2, 0),
        (1, 2, 1.30, 0.52, 0.93, 1.4, -2),
        (0, 2, 1.19, 0.34, 0.66, 1.8, -3),
        (3, 1, 1.32, 0.57, 1.0, 1.3, -1),
        (2, 1, 1.29, 0.49, 0.92, 1.4, -1),
        (1, 1, 1.14, 0.26, 0.52, 2.2, -5),
    ],
    (2, -3): [
        (4, 4, 0.63, 0.42, 0.84, 0.75, -2),
        (2, 4, 0.615, 0.37, 0.72, 0.85, -3),
        (0, 4, 0.55, 0.21, 0.46, 1.2, -5),
        (3, 3, 0.615, 0.37, 0.68, 0.9, -3),
        (6, 2, 0.63, 0.42, 0.84, 0.75, -2),
        (5, 2, 0.625, 0.41, 0.78, 0.8, -2),
        (4, 2, 0.61, 0.35, 0.68, 0.9, -3),
        (2, 2, 0.515, 0.14, 0.33, 1.55, -11),
    ],
    (3, -4): [
        (6, 3, 0.389, 0.31, 0.55, 0.71, -2),
        (5, 3, 0.375, 0.21, 0.47, 0.80, -3),
        (4, 3, 0.351, 0.14, 0.35, 1.0, -6),
        (6, 2, 0.362, 0.16, 0.45, 0.80, -4),
        (5, 2, 0.330, 0.092, 0.28, 1.2, -13),
        (4, 2, 0.281, 0.046, 0.16, 1.8, -23),
    ],
    (1, -1): [
        (3, 2, 1.09, 0.31, 0.55, 2.0, -6),
        (2, 2, 1.07, 0.27, 0.49, 2.2, -8),
        (1, 2, 1.02, 0.21, 0.36, 2.8, -15),
        (0, 2, 0.80, 0.064, 0.17, 4.8, -43),
        (4, 1, 1.08, 0.28, 0.54, 2.0, -6),
        (3, 1, 1.06, 0.25, 0.46, 2.3, -10),
        (2, 1, 0.99, 0.17, 0.30, 3.3, -23),
    ],
}


class KarlinAltschulError(ValueError):
    """Raised when no KA parameters exist for a scheme (the reference throws
    'Could not compute Karlin-Altschul-Values for Scoring Scheme',
    search_algo.hpp:232-233)."""


@functools.lru_cache(maxsize=None)
def get_ka_params(kind: str, gap_open: int, gap_extend: int,
                  match: int = 0, mismatch: int = 0):
    """Return (lambda, K, H, alpha, beta) for a scheme.

    ``gap_open``/``gap_extend`` in the options' (negative) convention.
    """
    o, e = -gap_open, -gap_extend
    if kind == "blosum62":
        table = BLOSUM62_VALUES
    elif kind == "blosum45":
        table = BLOSUM45_VALUES
    elif kind == "blosum80":
        table = BLOSUM80_VALUES
    elif kind == "simple":
        if o == 0 and e == 0:
            # ungapped nucleotide params are computed exactly (NCBI does the
            # same via Blast_KarlinBlkUngappedCalc)
            return blastn_ungapped_params(match, mismatch)
        table = BLASTN_VALUES.get((match, mismatch))
        if table is None:
            raise KarlinAltschulError(
                f"No Karlin-Altschul values for match/mismatch {match}/{mismatch}")
    else:
        raise KarlinAltschulError(f"Unknown scheme kind {kind!r}")

    for row in table:
        if row[0] == o and row[1] == e:
            return row[2:]
    raise KarlinAltschulError(
        f"No Karlin-Altschul values for {kind} with gap open/extend {o}/{e}")


def _score_probs(matrix: np.ndarray, freqs: np.ndarray):
    """Distribution of the per-position score under background freqs.
    Returns (scores_low, probs_array) with probs_array[i] = P(score=low+i)."""
    s = matrix.astype(np.int64)
    p = np.outer(freqs, freqs)
    lo, hi = int(s.min()), int(s.max())
    probs = np.zeros(hi - lo + 1, dtype=np.float64)
    np.add.at(probs, (s - lo).ravel(), p.ravel())
    return lo, probs


def ungapped_lambda_K_H(matrix: np.ndarray, freqs: np.ndarray):
    """Analytic ungapped Karlin-Altschul lambda and H for a score matrix and
    background frequencies (NCBI Blast_KarlinLambdaNR / BlastKarlinLtoH).

    lambda solves sum_ij p_i p_j exp(lambda*s_ij) = 1;
    H = lambda * sum_ij p_i p_j s_ij exp(lambda*s_ij).
    """
    s = matrix.astype(np.float64)
    p = np.outer(freqs, freqs)
    if float((p * s).sum()) >= 0:
        raise KarlinAltschulError("invalid scoring scheme (nonnegative expectation)")

    def f(lam):
        return float((p * np.exp(lam * s)).sum()) - 1.0

    lo, hi = 1e-6, 20.0
    if f(hi) < 0:
        raise KarlinAltschulError("invalid scoring scheme")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > 0:
            hi = mid
        else:
            lo = mid
    lam = 0.5 * (lo + hi)
    H = lam * float((p * s * np.exp(lam * s)).sum())
    return lam, H


def karlin_lh_to_k(matrix: np.ndarray, freqs: np.ndarray,
                   lam: float, H: float) -> float:
    """Ungapped Karlin-Altschul K (NCBI blast_stat.c BlastKarlinLHtoK).

    Uses the closed forms for the simple lattice cases and the convolution
    series K = lambda * exp(-2*sigma) / (H * (1 - exp(-lambda))) with
    sigma = sum_k (1/k) * (sum_{j<0} P_k(j) e^{lambda j} + sum_{j>=0} P_k(j))
    otherwise.
    """
    low, probs = _score_probs(matrix, freqs)
    # trim to the attained support: zero-frequency letters can leave
    # low/high at scores that never occur, which would mis-anchor the
    # gcd rescale below (d must divide every attained score - low)
    nz = np.flatnonzero(np.asarray(probs) > 0)
    if len(nz) == 0:
        raise KarlinAltschulError("invalid score distribution")
    probs = probs[nz[0]: nz[-1] + 1]
    low += int(nz[0])
    high = low + len(probs) - 1
    if low >= 0:
        raise KarlinAltschulError("invalid score distribution")

    # rescale by the gcd of all attained scores
    attained = [s for s, pr in zip(range(low, high + 1), probs) if pr > 0 and s != 0]
    d = 0
    for s in attained:
        d = math.gcd(d, abs(s))
    d = max(d, 1)
    if d > 1:
        low //= d
        probs = _regcd(probs, d)
        high = low + len(probs) - 1
        lam = lam * d

    if low == -1 and high == 1:
        return float((probs[0] - probs[-1]) ** 2 / probs[0])
    if high == 1:
        # closed form: K = (H'/lambda) * (1 - e^-lambda) in rescaled units
        h_over_lam = float(
            sum(pr * s * math.exp(lam * s) for s, pr in zip(range(low, high + 1), probs))
        )
        return h_over_lam * (1.0 - math.exp(-lam))
    return _karlin_k_general(low, probs, lam)


def _regcd(probs: np.ndarray, d: int) -> np.ndarray:
    """Collapse a score distribution whose support is a multiple of d."""
    n = (len(probs) - 1) // d + 1
    out = np.zeros(n, dtype=np.float64)
    for i, pr in enumerate(probs):
        if pr > 0:
            assert i % d == 0
            out[i // d] = pr
    return out


def _karlin_k_general(low: int, probs: np.ndarray, lam: float,
                      max_iter: int = 1000, sumlimit: float = 1e-10) -> float:
    """Convolution-series sigma computation (general case of
    BlastKarlinLHtoK), in float64 with a tight stopping criterion."""
    high = low + len(probs) - 1
    scores = np.arange(low, high + 1, dtype=np.float64)
    h_times = float((probs * scores * np.exp(lam * scores)).sum())  # H/lambda

    pk = probs.copy()
    pk_low = low
    sigma = 0.0
    for k in range(1, max_iter + 1):
        s_vals = np.arange(pk_low, pk_low + len(pk), dtype=np.float64)
        neg = s_vals < 0
        inner = float((pk[neg] * np.exp(lam * s_vals[neg])).sum() + pk[~neg].sum())
        term = inner / k
        sigma += term
        if term < sumlimit:
            break
        pk = np.convolve(pk, probs)
        pk_low += low

    # K = lambda * exp(-2 sigma) / (H * (1 - e^-lambda)) with H = lambda*h_times
    return math.exp(-2.0 * sigma) / (h_times * (1.0 - math.exp(-lam)))


def blastn_ungapped_params(match: int, mismatch: int):
    """Exact ungapped (lambda, K, H, alpha, beta) for a match/mismatch
    scheme at uniform base composition, as NCBI computes them
    (alpha = lambda/H, beta = 0 for ungapped blastn)."""
    from . import scoring

    m = scoring.simple_dna_matrix(match, mismatch)[:4, :4]
    freqs = np.full(4, 0.25)
    lam, H = ungapped_lambda_K_H(m, freqs)
    K = karlin_lh_to_k(m, freqs, lam, H)
    return (lam, K, H, lam / H, 0.0)


# Robinson & Robinson amino-acid background frequencies (NCBI order A..*),
# over aa27 ranks; zero for non-standard letters.
_ROBINSON = {
    "A": 0.07805, "C": 0.01925, "D": 0.05364, "E": 0.06295, "F": 0.03856,
    "G": 0.07377, "H": 0.02199, "I": 0.05142, "K": 0.05744, "L": 0.09019,
    "M": 0.02243, "N": 0.04487, "P": 0.05203, "Q": 0.04264, "R": 0.05129,
    "S": 0.07120, "T": 0.05841, "V": 0.06441, "W": 0.01330, "Y": 0.03216,
}


def robinson_freqs_aa27() -> np.ndarray:
    from . import alphabets as ab

    f = np.zeros(27, dtype=np.float64)
    for c, v in _ROBINSON.items():
        f[ab._AA27_CHARS.index(c)] = v
    return f / f.sum()


# ---------------------------------------------------------------------------
# Length adjustment (SeqAn2 _lengthAdjustment == NCBI
# BLAST_ComputeLengthAdjustment with N=1)
# ---------------------------------------------------------------------------


def length_adjustment(db_length: int, query_length: int, params) -> int:
    lam, K, H, alpha, beta = params
    if K <= 0:
        return 0
    log_k = math.log(K)
    alpha_d_lambda = alpha / lam
    max_its = 20
    m = float(query_length)
    n = float(db_length)

    # largest nonnegative val satisfying K*(m-val)*(n-val) > max(m,n)
    mb = m + n
    c = n * m - max(m, n) / K
    if c < 0:
        return 0
    val_max = 2.0 * c / (mb + math.sqrt(mb * mb - 4.0 * c))

    val = 0.0
    val_min = 0.0
    converged = False
    for i in range(1, max_its + 1):
        total_len = (m - val) * (n - val)
        val_new = alpha_d_lambda * (log_k + math.log(total_len)) + beta
        if val_new >= val:
            val_min = val
            if val_new - val_min <= 1.0:
                converged = True
                break
            if val_min == val_max:
                break
        else:
            val_max = val
        if val_min <= val_new <= val_max:
            val = val_new
        else:
            val = val_max if i == 1 else 0.5 * (val_min + val_max)

    if converged:
        # normally floor(val_min); check whether ceil(val_min) also works
        result = int(val_min)
        val = math.ceil(val_min)
        if val <= val_max:
            total_len = (m - val) * (n - val)
            if alpha_d_lambda * (log_k + math.log(total_len)) + beta >= val:
                result = int(val)
        return result
    return int(val_min)


# ---------------------------------------------------------------------------
# Bit score / e-value (SeqAn2 computeBitScore / _computeEValue)
# ---------------------------------------------------------------------------


def bit_score(raw_score: int, params) -> float:
    lam, K = params[0], params[1]
    return (lam * raw_score - math.log(K)) / math.log(2.0)


def e_value(raw_score: int, eff_qlen: int, eff_dblen: int, params) -> float:
    lam, K = params[0], params[1]
    return K * float(eff_qlen) * float(eff_dblen) * math.exp(-lam * raw_score)


class EValuer:
    """Per-run e-value computer with the reference's per-qlen length
    adjustment cache (search_misc.hpp:56-80)."""

    def __init__(self, params, db_total_length: int, q_is_translated: bool):
        self.params = params
        self.db_total_length = int(db_total_length)
        self.q_is_translated = q_is_translated
        self._adj_cache: dict[int, int] = {}

    def effective_qlen(self, qlen: int) -> int:
        return qlen // 3 if self.q_is_translated else qlen

    def length_adjustment(self, qlen: int) -> int:
        return self._adj_for_eff(self.effective_qlen(qlen))

    def _adj_for_eff(self, ql: int) -> int:
        adj = self._adj_cache.get(ql)
        if adj is None:
            adj = length_adjustment(self.db_total_length, ql, self.params)
            self._adj_cache[ql] = adj
        return adj

    def e_value(self, raw_score: int, qlen: int) -> float:
        ql = self.effective_qlen(qlen)
        adj = self._adj_for_eff(ql)
        return e_value(raw_score, ql - adj, self.db_total_length - adj, self.params)

    def bit_score(self, raw_score: int) -> float:
        return bit_score(raw_score, self.params)

    # ---- vectorized variants (hot pipeline path) ----

    def bit_score_v(self, raw_scores: np.ndarray) -> np.ndarray:
        lam, K = self.params[0], self.params[1]
        return (lam * raw_scores.astype(np.float64) - math.log(K)) \
            / math.log(2.0)

    def e_value_v(self, raw_scores: np.ndarray,
                  qlens: np.ndarray) -> np.ndarray:
        """Vectorized e_value; the per-qlen length adjustment is computed
        once per distinct query length (mirrors the scalar cache)."""
        lam, K = self.params[0], self.params[1]
        ql = qlens // 3 if self.q_is_translated else qlens
        uq, inv = np.unique(ql, return_inverse=True)
        adjs = []
        for u in uq:
            u = int(u)
            if u not in self._adj_cache:
                self._adj_cache[u] = length_adjustment(
                    self.db_total_length, u, self.params)
            adjs.append(self._adj_cache[u])
        adj = np.array(adjs, dtype=np.float64)[inv]
        return (K * (ql - adj) * (self.db_total_length - adj)
                * np.exp(-lam * raw_scores.astype(np.float64)))
