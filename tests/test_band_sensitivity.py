"""Quantifies PARITY.md deviation 6 (banded extension): how often does
restricting extension to the widener's intended band (seed diagonal
± sqrt(qlen)+1, ops/sw_band.py semantics) change the alignment score
versus the reference's full-rectangle DP?

The widener's band is designed to contain alignments whose net indel
excursion stays within ±(sqrt(qlen)+1) of the seed diagonal — i.e.
everything the sqrt-band window heuristic itself assumes.  This test
generates realistic homologs (substitutions + short indels) and
measures banded-vs-rectangle score agreement; it asserts the agreement
the deviation note relies on, and demonstrates the expected failure
mode (an indel burst larger than the band) for documentation.
"""

import numpy as np
import pytest

from lambda_tpu import native
from lambda_tpu.ops import sw_xla

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib unavailable")


def _mutate(rng, seq, n_sub, indels):
    """indels: list of signed lengths (+ins, -del) scattered randomly."""
    s = list(seq)
    for _ in range(n_sub):
        s[rng.integers(0, len(s))] = int(rng.integers(0, 20))
    for ln in indels:
        p = int(rng.integers(0, len(s)))
        if ln > 0:
            s[p:p] = [int(rng.integers(0, 20)) for _ in range(ln)]
        else:
            del s[p : p - ln]
    return np.array(s, dtype=np.int32)


@needs_native
def test_band_sensitivity_on_homologs():
    rng = np.random.default_rng(11)
    A = 20
    subst = np.full((A, A), -2, dtype=np.int32)
    np.fill_diagonal(subst, 6)

    n = 120
    qlen = 200
    band = int(np.sqrt(qlen)) + 1          # the widener's margin (11 + 1)
    agree = 0
    q_list, s_list, bands = [], [], []
    for _ in range(n):
        q = rng.integers(0, A, size=qlen).astype(np.int32)
        # homolog: 10% substitutions + up to 3 indels of length 1-4
        nind = int(rng.integers(0, 4))
        indels = [int(rng.integers(1, 5)) * (1 if rng.random() < 0.5 else -1)
                  for _ in range(nind)]
        hom = _mutate(rng, q, qlen // 10, indels)
        # pipeline-shaped virtual window: query vs the homolog padded to
        # qlen + 2*band, seed diagonal centered (d in [0, 2*band])
        win = np.full(qlen + 2 * band, A, dtype=np.int32)
        win[band : band + min(len(hom), qlen + band)] = \
            hom[: min(len(hom), qlen + band)]
        q_list.append(q)
        s_list.append(win)
        bands.append(2 * band)
    ext = sw_xla.extend_matrix(subst)
    banded = native.sw_score_batch(q_list, s_list, ext, -11, -1,
                                   band=np.array(bands, np.int32))
    full = native.sw_score_batch(q_list, s_list, ext, -11, -1)
    agree = int((banded == full).sum())
    # the band must capture effectively all realistic homolog alignments
    assert agree >= int(0.97 * n), f"band agreement {agree}/{n}"


@needs_native
def test_band_misses_oversized_indel_burst():
    """The documented failure mode: a single indel burst LARGER than the
    sqrt-band margin pushes the optimum off-band — the banded score is
    then lower than the rectangle's (never higher)."""
    rng = np.random.default_rng(12)
    A = 20
    subst = np.full((A, A), -2, dtype=np.int32)
    np.fill_diagonal(subst, 6)
    qlen = 200
    band = int(np.sqrt(qlen)) + 1
    q = rng.integers(0, A, size=qlen).astype(np.int32)
    hom = _mutate(rng, q, 0, [3 * band])   # one huge insertion
    win = np.full(qlen + 2 * band + 3 * band, A, dtype=np.int32)
    win[band : band + len(hom)] = hom[: len(win) - band]
    ext = sw_xla.extend_matrix(subst)
    banded = native.sw_score_batch([q], [win], ext, -11, -1,
                                   band=np.array([2 * band], np.int32))
    full = native.sw_score_batch([q], [win], ext, -11, -1)
    assert banded[0] < full[0]
    assert banded[0] > 0                   # still finds the in-band part
