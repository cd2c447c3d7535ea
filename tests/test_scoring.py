import numpy as np

from lambda_tpu import alphabets as ab
from lambda_tpu import scoring


def _s(m, a, b):
    ra = ab.encode(a, ab.AMINO_ACID)[0]
    rb = ab.encode(b, ab.AMINO_ACID)[0]
    return int(m[ra, rb])


def test_blosum62_known_values():
    m = scoring.BLOSUM62
    assert _s(m, "A", "A") == 4
    assert _s(m, "W", "W") == 11
    assert _s(m, "C", "C") == 9
    assert _s(m, "A", "R") == -1
    assert _s(m, "E", "Q") == 2
    assert _s(m, "*", "*") == 1
    assert _s(m, "A", "*") == -4
    # extended letters: U==C, O==K
    assert _s(m, "U", "U") == 9
    assert _s(m, "U", "C") == 9
    assert _s(m, "O", "K") == 5
    # J (Xle): NCBI raw_scoremat.c sm_blosum62 row, not min(I, L)
    assert _s(m, "J", "I") == 3
    assert _s(m, "J", "L") == 3
    assert _s(m, "J", "J") == 3
    assert _s(m, "J", "M") == 2
    assert _s(m, "J", "V") == 2
    assert _s(m, "J", "F") == 0
    assert _s(m, "J", "A") == -1
    assert _s(m, "J", "G") == -4
    # BLOSUM45/80 J rows are the documented half-up I/L mean (PARITY.md)
    m45 = scoring.BLOSUM45
    assert _s(m45, "J", "J") == 4
    assert _s(m45, "J", "I") == 4  # (5 + 2 + 1) // 2


def test_blosum_matrices_symmetric():
    for m in (scoring.BLOSUM45, scoring.BLOSUM62, scoring.BLOSUM80):
        assert (m == m.T).all()


def test_blosum45_80_spot():
    assert _s(scoring.BLOSUM45, "A", "A") == 5
    assert _s(scoring.BLOSUM45, "W", "W") == 15
    assert _s(scoring.BLOSUM45, "C", "C") == 12
    assert _s(scoring.BLOSUM80, "A", "A") == 5
    assert _s(scoring.BLOSUM80, "W", "W") == 11
    assert _s(scoring.BLOSUM80, "C", "C") == 9


def test_simple_dna():
    m = scoring.simple_dna_matrix(2, -3)
    assert m[0, 0] == 2 and m[0, 1] == -3
    assert m[4, 4] == 2  # N==N counts as match in seqan Simple scheme


def test_bisulfite_matrices():
    fwd = scoring.bisulfite_matrix(0, -1, "fwd")
    rev = scoring.bisulfite_matrix(0, -1, "rev")
    # fwd: T (query) vs C (subject) is a match, not the reverse
    assert fwd[3, 1] == 0 and fwd[1, 3] == -1
    # rev: A vs G is a match
    assert rev[0, 2] == 0 and rev[2, 0] == -1
    # N never matches
    assert fwd[4, 4] == -1 and rev[4, 4] == -1
    # matches the hard-coded table in bisulfite_scoring.hpp:54-61
    expect_fwd = np.array([
        [0, -1, -1, -1, -1],
        [-1, 0, -1, -1, -1],
        [-1, -1, 0, -1, -1],
        [-1, 0, -1, 0, -1],
        [-1, -1, -1, -1, -1],
    ])
    assert (fwd == expect_fwd).all()


def test_gap_convention():
    sch = scoring.make_protein_scheme(62, -11, -1)
    # DP charges open+extend at first gap char (search_algo.hpp:226)
    assert sch.dp_gap_first == -12
    assert sch.dp_gap_extend == -1


def test_positive_gap_scores_rejected():
    # gapOpen > 0 breaks the cummax F-prefix precondition in the XLA
    # x-drop and pallas kernels (backend-dependent scores otherwise)
    import pytest
    with pytest.raises(ValueError):
        scoring.make_nucleotide_scheme(2, -3, gap_open=1, gap_extend=-5)
    with pytest.raises(ValueError):
        scoring.make_protein_scheme(62, gap_open=-11, gap_extend=2)
