"""Scoring schemes: BLOSUM matrices, simple nucleotide scores, bisulfite
matrices, and gap conventions.

TPU-native equivalent of the reference's SeqAn2 score module usage
(``/root/reference/src/search_algo.hpp:161-234`` prepareScoring,
``/root/reference/src/bisulfite_scoring.hpp:39-95``).

Conventions (copied from the reference):

* options carry BLAST-style gap scores: ``gapOpen`` (extra cost of opening)
  and ``gapExtend`` (cost per gap char).  A gap of length L costs
  ``gapOpen + L * gapExtend`` (all scores negative).
* the *alignment* scheme therefore uses ``open = gapOpen + gapExtend``
  charged at the first gap char and ``extend = gapExtend`` after
  (search_algo.hpp:226-230).

Matrices are stored over the full aa27 rank space (A..Z,*) so translated
sequences can be scored directly.  The 24-letter canonical NCBI BLOSUM data
is extended to J/O/U following NCBI's ``raw_scoremat.c`` / SeqAn2's
27-letter matrices: ``U == C``, ``O == K``, and J (Xle = I or L) gets its
own row.  For BLOSUM62 the J row is NCBI's own (sm_blosum62); for
BLOSUM45/80 the authoritative rows were unavailable offline and J is
approximated by the round-half-up elementwise mean of the I and L rows
(reproduces 23/24 entries of the known BLOSUM62 J row; documented in
PARITY.md "Known deviations").
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import alphabets as ab

# canonical NCBI residue order of the 24-letter matrices
_NCBI_ORDER = "ARNDCQEGHILKMFPSTWYVBZX*"

_BLOSUM62 = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0 -2 -1  0 -4
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3 -1  0 -1 -4
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3  3  0 -1 -4
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3  4  1 -1 -4
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1 -3 -3 -2 -4
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2  0  3 -1 -4
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3 -1 -2 -1 -4
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3  0  0 -1 -4
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3 -3 -3 -1 -4
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1 -4 -3 -1 -4
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2  0  1 -1 -4
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1 -3 -1 -1 -4
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1 -3 -3 -1 -4
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2 -2 -1 -2 -4
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2  0  0  0 -4
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0 -1 -1  0 -4
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3 -4 -3 -2 -4
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1 -3 -2 -1 -4
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4 -3 -2 -1 -4
-2 -1  3  4 -3  0  1 -1  0 -3 -4  0 -3 -3 -2  0 -1 -4 -3 -3  4  1 -1 -4
-1  0  0  1 -3  3  4 -2  0 -3 -3  1 -1 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -1 -1 -1 -2 -1 -1 -1 -1 -1 -1 -1 -1 -1 -2  0  0 -2 -1 -1 -1 -1 -1 -4
-4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4  1
"""

_BLOSUM45 = """
 5 -2 -1 -2 -1 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -2 -2  0 -1 -1  0 -5
-2  7  0 -1 -3  1  0 -2  0 -3 -2  3 -1 -2 -2 -1 -1 -2 -1 -2 -1  0 -1 -5
-1  0  6  2 -2  0  0  0  1 -2 -3  0 -2 -2 -2  1  0 -4 -2 -3  4  0 -1 -5
-2 -1  2  7 -3  0  2 -1  0 -4 -3  0 -3 -4 -1  0 -1 -4 -2 -3  5  1 -1 -5
-1 -3 -2 -3 12 -3 -3 -3 -3 -3 -2 -3 -2 -2 -4 -1 -1 -5 -3 -1 -2 -3 -2 -5
-1  1  0  0 -3  6  2 -2  1 -2 -2  1  0 -4 -1  0 -1 -2 -1 -3  0  4 -1 -5
-1  0  0  2 -3  2  6 -2  0 -3 -2  1 -2 -3  0  0 -1 -3 -2 -3  1  4 -1 -5
 0 -2  0 -1 -3 -2 -2  7 -2 -4 -3 -2 -2 -3 -2  0 -2 -2 -3 -3 -1 -2 -1 -5
-2  0  1  0 -3  1  0 -2 10 -3 -2 -1  0 -2 -2 -1 -2 -3  2 -3  0  0 -1 -5
-1 -3 -2 -4 -3 -2 -3 -4 -3  5  2 -3  2  0 -2 -2 -1 -2  0  3 -3 -3 -1 -5
-1 -2 -3 -3 -2 -2 -2 -3 -2  2  5 -3  2  1 -3 -3 -1 -2  0  1 -3 -2 -1 -5
-1  3  0  0 -3  1  1 -2 -1 -3 -3  5 -1 -3 -1 -1 -1 -2 -1 -2  0  1 -1 -5
-1 -1 -2 -3 -2  0 -2 -2  0  2  2 -1  6  0 -2 -2 -1 -2  0  1 -2 -1 -1 -5
-2 -2 -2 -4 -2 -4 -3 -3 -2  0  1 -3  0  8 -3 -2 -1  1  3  0 -3 -3 -1 -5
-1 -2 -2 -1 -4 -1  0 -2 -2 -2 -3 -1 -2 -3  9 -1 -1 -3 -3 -3 -2 -1 -1 -5
 1 -1  1  0 -1  0  0  0 -1 -2 -3 -1 -2 -2 -1  4  2 -4 -2 -1  0  0  0 -5
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -1 -1  2  5 -3 -1  0  0 -1  0 -5
-2 -2 -4 -4 -5 -2 -3 -2 -3 -2 -2 -2 -2  1 -3 -4 -3 15  3 -3 -4 -2 -2 -5
-2 -1 -2 -2 -3 -1 -2 -3  2  0  0 -1  0  3 -3 -2 -1  3  8 -1 -2 -2 -1 -5
 0 -2 -3 -3 -1 -3 -3 -3 -3  3  1 -2  1  0 -3 -1  0 -3 -1  5 -3 -3 -1 -5
-1 -1  4  5 -2  0  1 -1  0 -3 -3  0 -2 -3 -2  0  0 -4 -2 -3  4  2 -1 -5
-1  0  0  1 -3  4  4 -2  0 -3 -2  1 -1 -3 -1  0 -1 -2 -2 -3  2  4 -1 -5
 0 -1 -1 -1 -2 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -2 -1 -1 -1 -1 -1 -5
-5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5 -5  1
"""

_BLOSUM80 = """
 5 -2 -2 -2 -1 -1 -1  0 -2 -2 -2 -1 -1 -3 -1  1  0 -3 -2  0 -2 -1 -1 -6
-2  6 -1 -2 -4  1 -1 -3  0 -3 -3  2 -2 -4 -2 -1 -1 -4 -3 -3 -1  0 -1 -6
-2 -1  6  1 -3  0 -1 -1  0 -4 -4  0 -3 -4 -3  0  0 -4 -3 -4  5  0 -1 -6
-2 -2  1  6 -4 -1  1 -2 -2 -4 -5 -1 -4 -4 -2 -1 -1 -6 -4 -4  5  1 -1 -6
-1 -4 -3 -4  9 -4 -5 -4 -4 -2 -2 -4 -2 -3 -4 -2 -1 -3 -3 -1 -4 -4 -1 -6
-1  1  0 -1 -4  6  2 -2  1 -3 -3  1  0 -4 -2  0 -1 -3 -2 -3  0  4 -1 -6
-1 -1 -1  1 -5  2  6 -3  0 -4 -4  1 -2 -4 -2  0 -1 -4 -3 -3  1  5 -1 -6
 0 -3 -1 -2 -4 -2 -3  6 -3 -5 -4 -2 -4 -4 -3 -1 -2 -4 -4 -4 -1 -3 -1 -6
-2  0  0 -2 -4  1  0 -3  8 -4 -3 -1 -2 -2 -3 -1 -2 -3  2 -4 -1  0 -1 -6
-2 -3 -4 -4 -2 -3 -4 -5 -4  5  1 -3  1 -1 -4 -3 -1 -3 -2  3 -4 -4 -1 -6
-2 -3 -4 -5 -2 -3 -4 -4 -3  1  4 -3  2  0 -3 -3 -2 -2 -2  1 -4 -3 -1 -6
-1  2  0 -1 -4  1  1 -2 -1 -3 -3  5 -2 -4 -1 -1 -1 -4 -3 -3 -1  1 -1 -6
-1 -2 -3 -4 -2  0 -2 -4 -2  1  2 -2  6  0 -3 -2 -1 -2 -2  1 -3 -1 -1 -6
-3 -4 -4 -4 -3 -4 -4 -4 -2 -1  0 -4  0  6 -4 -3 -2  0  3 -1 -4 -4 -1 -6
-1 -2 -3 -2 -4 -2 -2 -3 -3 -4 -3 -1 -3 -4  8 -1 -2 -5 -4 -3 -2 -2 -1 -6
 1 -1  0 -1 -2  0  0 -1 -1 -3 -3 -1 -2 -3 -1  5  1 -4 -2 -2  0  0 -1 -6
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -2 -1 -1 -2 -2  1  5 -4 -2  0 -1 -1 -1 -6
-3 -4 -4 -6 -3 -3 -4 -4 -3 -3 -2 -4 -2  0 -5 -4 -4 11  2 -3 -5 -4 -1 -6
-2 -3 -3 -4 -3 -2 -3 -4  2 -2 -2 -3 -2  3 -4 -2 -2  2  7 -2 -3 -3 -1 -6
 0 -3 -4 -4 -1 -3 -3 -4 -4  3  1 -3  1 -1 -3 -2  0 -3 -2  4 -4 -3 -1 -6
-2 -1  5  5 -4  0  1 -1 -1 -4 -4 -1 -3 -4 -2  0 -1 -5 -3 -4  5  0 -1 -6
-1  0  0  1 -4  4  5 -3  0 -4 -3  1 -1 -4 -2  0 -1 -4 -3 -3  0  5 -1 -6
-1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -6
-6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6 -6  1
"""


# NCBI raw_scoremat.c sm_blosum62 J (Xle) row over _NCBI_ORDER, with the
# J-J diagonal separate.  Transcribed offline from the NCBI C toolkit's
# util/tables/raw_scoremat.c (the row is symmetric with the J column of
# every other row, which was used as a consistency check).
_BLOSUM62_J_ROW = np.array(
    [-1, -2, -3, -3, -1, -2, -3, -4, -3, 3, 3, -3, 2, 0,
     -3, -2, -1, -2, -1, 2, -3, -3, -1, -4], dtype=np.int32)
_BLOSUM62_J_DIAG = 3


def _parse_matrix(text: str) -> np.ndarray:
    rows = [r.split() for r in text.strip().splitlines()]
    m = np.array(rows, dtype=np.int32)
    assert m.shape == (24, 24)
    return m


def _to_aa27(m24: np.ndarray, j_row: np.ndarray | None = None,
             j_diag: int | None = None) -> np.ndarray:
    """Expand a 24-letter NCBI matrix to the aa27 rank space (A..Z,*).

    ``j_row``/``j_diag`` supply authoritative J scores when known;
    otherwise J is the round-half-up mean of the I and L rows (and of
    the 2x2 I/L block for the diagonal).
    """
    idx_of = {c: i for i, c in enumerate(_NCBI_ORDER)}
    aa27 = ab._AA27_CHARS

    def _half_up_mean(a, b):
        return np.floor((a.astype(np.int64) + b + 1) / 2).astype(np.int32)

    if j_row is None:
        j_row = _half_up_mean(m24[idx_of["I"]], m24[idx_of["L"]])
        ii, ll = idx_of["I"], idx_of["L"]
        block = m24[[ii, ii, ll, ll], [ii, ll, ii, ll]].astype(np.int64)
        j_diag = int(np.floor((block.sum() + 2) / 4))

    def src_row(c: str) -> np.ndarray:
        if c == "U":
            return m24[idx_of["C"]]
        if c == "O":
            return m24[idx_of["K"]]
        if c == "J":
            return j_row
        return m24[idx_of[c]]

    # first build a 27x24, then expand columns
    tmp = np.stack([src_row(c) for c in aa27])  # (27, 24)
    j27 = np.array([j_row[idx_of["C"]] if c == "U"
                    else j_row[idx_of["K"]] if c == "O"
                    else j_diag if c == "J"
                    else j_row[idx_of[c]] for c in aa27], dtype=np.int32)

    def src_col(c: str) -> np.ndarray:
        if c == "U":
            return tmp[:, idx_of["C"]]
        if c == "O":
            return tmp[:, idx_of["K"]]
        if c == "J":
            return j27
        return tmp[:, idx_of[c]]

    out = np.stack([src_col(c) for c in aa27], axis=1)  # (27, 27)
    return out


BLOSUM62 = _to_aa27(_parse_matrix(_BLOSUM62), _BLOSUM62_J_ROW, _BLOSUM62_J_DIAG)
BLOSUM45 = _to_aa27(_parse_matrix(_BLOSUM45))
BLOSUM80 = _to_aa27(_parse_matrix(_BLOSUM80))

BLOSUM_BY_ID = {45: BLOSUM45, 62: BLOSUM62, 80: BLOSUM80}


def simple_dna_matrix(match: int, mismatch: int) -> np.ndarray:
    """Simple scheme over dna5 ranks; matches seqan::Score<int, Simple>
    semantics: score = match iff ranks equal (N==N counts as match)."""
    m = np.full((5, 5), mismatch, dtype=np.int32)
    np.fill_diagonal(m, match)
    return m


def bisulfite_matrix(match: int, mismatch: int, direction: str) -> np.ndarray:
    """5x5 dna5 bisulfite matrices (bisulfite_scoring.hpp:68-93).

    fwd: (i==j or (i==T(3) and j==C(1))) and i != N  -> match
    rev: (i==j or (i==A(0) and j==G(2))) and i != N  -> match
    Note the asymmetry: row index is the *query* residue.
    """
    m = np.full((5, 5), mismatch, dtype=np.int32)
    for i in range(5):
        for j in range(5):
            if direction == "fwd":
                if ((i == j) or (i == 3 and j == 1)) and i != 4:
                    m[i, j] = match
            else:
                if ((i == j) or (i == 0 and j == 2)) and i != 4:
                    m[i, j] = match
    return m


@dataclasses.dataclass(frozen=True)
class ScoringScheme:
    """A fully-resolved scoring scheme.

    ``matrix`` is over trans-alphabet ranks (aa27 or dna5).
    ``gap_open``/``gap_extend`` are BLAST-convention (reference options):
    gap of length L costs -(gap_open + L*gap_extend) with both stored
    as negative ints, i.e. score contribution = gap_open + L*gap_extend.
    The DP uses ``first_gap_score = gap_open + gap_extend`` per
    search_algo.hpp:226-230.
    """

    matrix: np.ndarray
    gap_open: int  # negative
    gap_extend: int  # negative
    # identification for Karlin-Altschul lookup
    kind: str  # "blosum45" | "blosum62" | "blosum80" | "simple"
    match: int = 0  # simple only
    mismatch: int = 0  # simple only

    def __post_init__(self):
        # gap_open > 0 would make RE-OPENING a gap cheaper than
        # extending (dp_gap_first > dp_gap_extend), violating the
        # affine-gap precondition the max-plus/cummax F formulations in
        # ops/sw_xla.py and ops/sw_pallas.py rely on — they would
        # silently return scores different from the scalar DP.
        if self.gap_open > 0 or self.gap_extend > 0:
            raise ValueError(
                "gap scores must be <= 0 (BLAST convention): got "
                f"gapOpen={self.gap_open}, gapExtend={self.gap_extend}")

    @property
    def dp_gap_first(self) -> int:
        return self.gap_open + self.gap_extend

    @property
    def dp_gap_extend(self) -> int:
        return self.gap_extend


def make_protein_scheme(blosum_id: int, gap_open: int, gap_extend: int) -> ScoringScheme:
    return ScoringScheme(
        matrix=BLOSUM_BY_ID[blosum_id],
        gap_open=gap_open,
        gap_extend=gap_extend,
        kind=f"blosum{blosum_id}",
    )


def make_nucleotide_scheme(match: int, mismatch: int, gap_open: int, gap_extend: int) -> ScoringScheme:
    return ScoringScheme(
        matrix=simple_dna_matrix(match, mismatch),
        gap_open=gap_open,
        gap_extend=gap_extend,
        kind="simple",
        match=match,
        mismatch=mismatch,
    )


def make_bisulfite_scheme(match: int, mismatch: int, gap_open: int, gap_extend: int,
                          direction: str) -> ScoringScheme:
    return ScoringScheme(
        matrix=bisulfite_matrix(match, mismatch, direction),
        gap_open=gap_open,
        gap_extend=gap_extend,
        kind="simple",
        match=match,
        mismatch=mismatch,
    )
