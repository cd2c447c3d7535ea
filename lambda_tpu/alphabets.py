"""Alphabets, reductions, translation and complement tables.

TPU-native equivalent of the biocpp-core alphabet layer used by the
reference (``/root/reference/src/shared_definitions.hpp:93-223``): every
alphabet is an integer *rank* space and every transform is a plain numpy
lookup table that can be applied on host or shipped to the device.

Alphabets (ranks are 0-based):

=============  ====  =======================================================
name           size  rank order
=============  ====  =======================================================
``dna4``       4     ``ACGT``
``dna5``       5     ``ACGTN``
``aa27``       27    ``A..Z*``  (biocpp ``aa27``; unknown chars -> ``X``)
``murphy10``   10    ``ABCFGHIKPS``  (biocpp ``aa10murphy``)
``li10``       10    ``ABCFGHIJKP``  (biocpp ``aa10li``)
``dna3bs``     6     bisulfite semi-alphabet, see ``view_reduce_to_bisulfite``
=============  ====  =======================================================

All tables are module-level numpy arrays so they are cheap to embed as JAX
constants.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Alphabet name constants (mirror AlphabetEnum, shared_definitions.hpp:127-136)
# ---------------------------------------------------------------------------

DNA3BS = "dna3bs"
DNA4 = "dna4"
DNA5 = "dna5"
AMINO_ACID = "aminoacid"
MURPHY10 = "murphy10"
LI10 = "li10"

ALPHABET_SIZES = {
    DNA3BS: 6,
    DNA4: 4,
    DNA5: 5,
    AMINO_ACID: 27,
    MURPHY10: 10,
    LI10: 10,
}

# ---------------------------------------------------------------------------
# char <-> rank tables
# ---------------------------------------------------------------------------

_DNA4_CHARS = "ACGT"
_DNA5_CHARS = "ACGTN"
_AA27_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ*"

_MURPHY10_CHARS = "ABCFGHIKPS"
_LI10_CHARS = "ABCFGHIJKP"


def _char_table(default: int) -> np.ndarray:
    return np.full(256, default, dtype=np.uint8)


def _fill(tab: np.ndarray, chars: str) -> np.ndarray:
    for i, c in enumerate(chars):
        tab[ord(c)] = i
        tab[ord(c.lower())] = i
    return tab


# dna5: unknown characters (incl. IUPAC ambiguity codes) -> N;  U -> T
DNA5_CHAR_TO_RANK = _fill(_char_table(4), _DNA5_CHARS)
DNA5_CHAR_TO_RANK[ord("U")] = 3
DNA5_CHAR_TO_RANK[ord("u")] = 3

# dna4: unknown -> A (biocpp dna4 semantics); U -> T
DNA4_CHAR_TO_RANK = _fill(_char_table(0), _DNA4_CHARS)
DNA4_CHAR_TO_RANK[ord("U")] = 3
DNA4_CHAR_TO_RANK[ord("u")] = 3
DNA4_CHAR_TO_RANK[ord("N")] = 0  # explicit: N->A only used where N-randomize is off
DNA4_CHAR_TO_RANK[ord("n")] = 0

# aa27: unknown -> X (rank 23)
AA27_CHAR_TO_RANK = _fill(_char_table(_AA27_CHARS.index("X")), _AA27_CHARS)

DNA4_RANK_TO_CHAR = np.frombuffer(_DNA4_CHARS.encode(), dtype=np.uint8).copy()
DNA5_RANK_TO_CHAR = np.frombuffer(_DNA5_CHARS.encode(), dtype=np.uint8).copy()
AA27_RANK_TO_CHAR = np.frombuffer(_AA27_CHARS.encode(), dtype=np.uint8).copy()
MURPHY10_RANK_TO_CHAR = np.frombuffer(_MURPHY10_CHARS.encode(), dtype=np.uint8).copy()
LI10_RANK_TO_CHAR = np.frombuffer(_LI10_CHARS.encode(), dtype=np.uint8).copy()

# ---------------------------------------------------------------------------
# Amino-acid reductions (biocpp aa10murphy / aa10li conversion semantics)
# ---------------------------------------------------------------------------
# Murphy et al. (2000) 10-letter groups as implemented by biocpp aa10murphy:
#   A<-{A}, B<-{B,D,E,N,Q,Z}, C<-{C,U}, F<-{F,W,Y}, G<-{G}, H<-{H},
#   I<-{I,J,L,M,V}, K<-{K,O,R}, P<-{P}, S<-{S,T,X}; F-group also takes '*'
_MURPHY10_FROM_AA = {
    "A": "A", "B": "B", "C": "C", "D": "B", "E": "B", "F": "F", "G": "G",
    "H": "H", "I": "I", "J": "I", "K": "K", "L": "I", "M": "I", "N": "B",
    "O": "K", "P": "P", "Q": "B", "R": "K", "S": "S", "T": "S", "U": "C",
    "V": "I", "W": "F", "X": "S", "Y": "F", "Z": "B", "*": "F",
}

# Li et al. (2003) 10-letter groups as implemented by biocpp aa10li:
#   A<-{A,S,T,X}, B<-{B,D,E,Q,Z}, C<-{C,U}, F<-{F,W,Y,*}, G<-{G}, H<-{H,N},
#   I<-{I,V}, J<-{J,L,M}, K<-{K,O,R}, P<-{P}
_LI10_FROM_AA = {
    "A": "A", "B": "B", "C": "C", "D": "B", "E": "B", "F": "F", "G": "G",
    "H": "H", "I": "I", "J": "J", "K": "K", "L": "J", "M": "J", "N": "H",
    "O": "K", "P": "P", "Q": "B", "R": "K", "S": "A", "T": "A", "U": "C",
    "V": "I", "W": "F", "X": "A", "Y": "F", "Z": "B", "*": "F",
}


def _reduction_table(mapping: dict, reduced_chars: str) -> np.ndarray:
    tab = np.zeros(27, dtype=np.uint8)
    for i, c in enumerate(_AA27_CHARS):
        tab[i] = reduced_chars.index(mapping[c])
    return tab


AA27_TO_MURPHY10 = _reduction_table(_MURPHY10_FROM_AA, _MURPHY10_CHARS)
AA27_TO_LI10 = _reduction_table(_LI10_FROM_AA, _LI10_CHARS)

# identity for the "none" reduction
AA27_TO_AA27 = np.arange(27, dtype=np.uint8)

REDUCTION_TABLES = {
    (AMINO_ACID, MURPHY10): AA27_TO_MURPHY10,
    (AMINO_ACID, LI10): AA27_TO_LI10,
    (AMINO_ACID, AMINO_ACID): AA27_TO_AA27,
    # dna5 -> dna4 is NOT a table lookup: it requires mt19937
    # N-randomization (dna5_to_dna4_rand); frames.reduce_frames
    # special-cases it before consulting this dict.
}

# ---------------------------------------------------------------------------
# Bisulfite 6-rank semi-alphabet (view_reduce_to_bisulfite.hpp:36-148)
# ---------------------------------------------------------------------------
# Even (fwd) frames:  A->0, C->1, T->1, G->2    (C and T collapse)
# Odd (rev) frames:   A->3, G->3, C->4, T->5    (A and G collapse)
# input is dna4 ranks (A,C,G,T)
DNA4_TO_BS_FWD = np.array([0, 1, 2, 1], dtype=np.uint8)
DNA4_TO_BS_REV = np.array([3, 4, 3, 5], dtype=np.uint8)

# ---------------------------------------------------------------------------
# Nucleotide complement (dna5 rank space; N -> N)
# ---------------------------------------------------------------------------
DNA5_COMPLEMENT = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
DNA4_COMPLEMENT = np.array([3, 2, 1, 0], dtype=np.uint8)


def reverse_complement(seq_ranks: np.ndarray, alphabet: str = DNA5) -> np.ndarray:
    comp = DNA5_COMPLEMENT if alphabet == DNA5 else DNA4_COMPLEMENT
    return comp[seq_ranks[::-1]]


# ---------------------------------------------------------------------------
# Genetic code (bio::alphabet::genetic_code; only code 1 = standard for now,
# matching the reference which hardcodes geneticCodeTmp = 1,
# search_options.hpp:170 / mkindex_options.hpp:177)
# ---------------------------------------------------------------------------

# NCBI standard code, codon order TTT, TTC, TTA, TTG, TCT ... (T,C,A,G nesting)
_NCBI_CODE_1 = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
_NCBI_BASE_ORDER = "TCAG"


def _build_codon_table(code_str: str) -> np.ndarray:
    """64-entry table indexed by b1*16 + b2*4 + b3 with bases in dna4 rank
    order (A=0, C=1, G=2, T=3); values are aa27 ranks."""
    tab = np.zeros(64, dtype=np.uint8)
    for i1, c1 in enumerate(_NCBI_BASE_ORDER):
        for i2, c2 in enumerate(_NCBI_BASE_ORDER):
            for i3, c3 in enumerate(_NCBI_BASE_ORDER):
                aa = code_str[i1 * 16 + i2 * 4 + i3]
                idx = (
                    DNA4_CHAR_TO_RANK[ord(c1)] * 16
                    + DNA4_CHAR_TO_RANK[ord(c2)] * 4
                    + DNA4_CHAR_TO_RANK[ord(c3)]
                )
                tab[idx] = AA27_CHAR_TO_RANK[ord(aa)]
    return tab


CODON_TABLE_STD = _build_codon_table(_NCBI_CODE_1)
GENETIC_CODES = {1: CODON_TABLE_STD}

_AA_X = int(AA27_CHAR_TO_RANK[ord("X")])


def _build_codon_table_dna5(tab64: np.ndarray) -> np.ndarray:
    """125-entry dna5 codon table (idx = c0*25 + c1*5 + c2): degenerate
    codons containing 'N' resolve to the amino acid when every expansion
    agrees (biocpp/seqan3 translate semantics, e.g. GCN -> A), else X."""
    tab = np.zeros(125, dtype=np.uint8)
    for c0 in range(5):
        for c1 in range(5):
            for c2 in range(5):
                e0 = range(4) if c0 == 4 else (c0,)
                e1 = range(4) if c1 == 4 else (c1,)
                e2 = range(4) if c2 == 4 else (c2,)
                aas = {int(tab64[a * 16 + b * 4 + c])
                       for a in e0 for b in e1 for c in e2}
                tab[c0 * 25 + c1 * 5 + c2] = (aas.pop() if len(aas) == 1
                                              else _AA_X)
    return tab


GENETIC_CODES_DNA5 = {k: _build_codon_table_dna5(v)
                      for k, v in GENETIC_CODES.items()}


def translate(dna5_ranks: np.ndarray, frame: int, code: int = 1) -> np.ndarray:
    """Translate one frame of a dna5-rank sequence into aa27 ranks.

    ``frame`` in {1,2,3,-1,-2,-3} following the reference convention
    (search_algo.hpp:771-781): positive = plus strand offset |frame|-1,
    negative = reverse complement offset |frame|-1.  Degenerate codons
    containing 'N' resolve to the amino acid when every expansion agrees
    (biocpp translate semantics, e.g. GCN -> A), else to 'X'.
    """
    if frame == 0 or not -3 <= frame <= 3:
        raise ValueError(f"frame must be in {{1,2,3,-1,-2,-3}}, got {frame}")
    tab = GENETIC_CODES_DNA5[code]
    seq = dna5_ranks if frame > 0 else DNA5_COMPLEMENT[dna5_ranks[::-1]]
    off = abs(frame) - 1
    usable = (len(seq) - off) // 3
    if usable <= 0:
        return np.zeros(0, dtype=np.uint8)
    codons = seq[off : off + usable * 3].reshape(usable, 3).astype(np.int32)
    idx = codons[:, 0] * 25 + codons[:, 1] * 5 + codons[:, 2]
    return tab[idx].astype(np.uint8)


def six_frames(dna5_ranks: np.ndarray, code: int = 1) -> list[np.ndarray]:
    """All six translation frames in the reference's frame order
    (ids 0..5 = frames +1,+2,+3,-1,-2,-3; search_algo.hpp:771-781)."""
    return [translate(dna5_ranks, f, code) for f in (1, 2, 3, -1, -2, -3)]


# ---------------------------------------------------------------------------
# C++ std::mt19937-compatible generator for dna5 -> dna4 'N' randomization
# (view_dna_n_to_random.hpp:48-56: one mt19937{0xDEADBEEF} per sequence,
#  each 'N' consumes one draw, replaced by rank = draw % 4)
# ---------------------------------------------------------------------------


class MT19937:
    """Minimal C++-compatible std::mt19937 (seed-by-value initialization)."""

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER_MASK = 0x80000000
    LOWER_MASK = 0x7FFFFFFF

    def __init__(self, seed: int):
        mt = np.zeros(self.N, dtype=np.uint64)
        mt[0] = seed & 0xFFFFFFFF
        for i in range(1, self.N):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> np.uint64(30))) + i) & 0xFFFFFFFF
        self.mt = mt.astype(np.uint32)
        self.idx = self.N

    def _generate_block(self) -> None:
        # The twist is in-place in C++: mt[i] = mt[(i+M)%N] ^ twist(mt[i],
        # mt[i+1]) where indices >= N-M read already-updated values.  We
        # replicate that with three vectorized stages whose inputs are
        # fully computed by the previous stage.
        N, M = self.N, self.M
        mt = self.mt.copy()

        def twist(y_hi, y_lo, base):
            y = (y_hi & np.uint32(self.UPPER_MASK)) | (y_lo & np.uint32(self.LOWER_MASK))
            mag = np.where((y & np.uint32(1)).astype(bool),
                           np.uint32(self.MATRIX_A), np.uint32(0))
            return base ^ (y >> np.uint32(1)) ^ mag

        # stage 1: i in [0, N-M): uses old mt throughout
        mt[0 : N - M] = twist(mt[0 : N - M], mt[1 : N - M + 1], mt[M:N])
        # stage 2: i in [N-M, 2*(N-M)): base = new mt[i+M-N] from stage 1;
        # y uses old mt[i], mt[i+1] (not yet overwritten)
        a, b = N - M, 2 * (N - M)
        mt[a:b] = twist(mt[a:b], mt[a + 1 : b + 1], mt[0 : b - a])
        # stage 3: i in [2*(N-M), N-1): base = new values from stage 2
        c = N - 1
        mt[b:c] = twist(mt[b:c], mt[b + 1 : c + 1], mt[b - a : c - a])
        # last element: y uses NEW mt[0]
        mt[c] = twist(mt[c : c + 1], mt[0:1], mt[c - a : c - a + 1])[0]

        self.mt = mt
        self.idx = 0

    def draws(self, n: int) -> np.ndarray:
        """Return the next ``n`` tempered 32-bit outputs."""
        out = np.empty(n, dtype=np.uint32)
        filled = 0
        while filled < n:
            if self.idx >= self.N:
                self._generate_block()
            take = min(n - filled, self.N - self.idx)
            out[filled : filled + take] = self.mt[self.idx : self.idx + take]
            self.idx += take
            filled += take
        # tempering (vectorized)
        y = out.copy()
        y ^= y >> np.uint32(11)
        y ^= (y << np.uint32(7)) & np.uint32(0x9D2C5680)
        y ^= (y << np.uint32(15)) & np.uint32(0xEFC60000)
        y ^= y >> np.uint32(18)
        return y


def dna5_to_dna4_rand(seq_ranks: np.ndarray) -> np.ndarray:
    """dna5 -> dna4 with 'N' replaced pseudo-randomly, bit-compatible with the
    reference's views::dna_n_to_random (fresh mt19937{0xDEADBEEF} per
    sequence; i-th N gets the i-th draw % 4)."""
    out = seq_ranks.astype(np.uint8)  # astype copies; safe to scatter into
    n_mask = out == 4
    num_n = int(n_mask.sum())
    if num_n:
        rng = MT19937(0xDEADBEEF)
        out[n_mask] = (rng.draws(num_n) % np.uint32(4)).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Encoding helpers
# ---------------------------------------------------------------------------


def encode(seq: bytes | str, alphabet: str) -> np.ndarray:
    """Characters -> ranks for an *original* alphabet (dna5 or aa27)."""
    if isinstance(seq, str):
        seq = seq.encode()
    arr = np.frombuffer(seq, dtype=np.uint8)
    if alphabet == DNA5:
        return DNA5_CHAR_TO_RANK[arr]
    if alphabet == DNA4:
        return DNA4_CHAR_TO_RANK[arr]
    if alphabet == AMINO_ACID:
        return AA27_CHAR_TO_RANK[arr]
    raise ValueError(f"cannot encode into alphabet {alphabet!r}")


def decode(ranks: np.ndarray, alphabet: str) -> str:
    tab = {
        DNA4: DNA4_RANK_TO_CHAR,
        DNA5: DNA5_RANK_TO_CHAR,
        AMINO_ACID: AA27_RANK_TO_CHAR,
        MURPHY10: MURPHY10_RANK_TO_CHAR,
        LI10: LI10_RANK_TO_CHAR,
    }[alphabet]
    return tab[np.asarray(ranks, dtype=np.uint8)].tobytes().decode()
