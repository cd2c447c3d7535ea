"""Suffix-prefix k-mer index construction — the TPU-native replacement for
the reference's FM-index (``/root/reference/src/mkindex_algo.hpp:600-618``
generateIndex; design sanctioned by BASELINE.json's north star).

Instead of a BWT/occ-table, every position of the reduced subject frames is
keyed by the next ``words * chars_per_word`` characters packed MSB-first
into ``words`` uint32 words (sentinel 0 past the frame end, ranks stored as
rank+1).  Sorting positions by this key makes every k-mer — for *any*
k <= capacity — a contiguous range, so:

* exact seed search   = one batched device binary search (lower/upper bound)
* cursor.extendRight  = narrowing the range with one more character
  (adaptive seeding, search_algo.hpp:679-726)
* approximate seeds   = neighborhood enumeration over variant keys
  (replaces FM backtracking / search schemes)
* locate              = reading ``pos``/``frame`` slices (replaces SA
  sampling + LocateLinear, search_algo.hpp:733)

This trades HBM bytes for total elimination of pointer-chasing: every
operation is a gather over sorted arrays, which XLA vectorizes across
thousands of seeds at once.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import alphabets as ab


def bits_for_alphabet(alphabet_size: int) -> int:
    """Bits per character: must hold ranks 1..alphabet_size plus sentinel 0."""
    return 4 if alphabet_size + 1 <= 16 else 5


@dataclasses.dataclass
class KmerIndex:
    """Sorted suffix-prefix key index over concatenated reduced frames."""

    alphabet_size: int
    bits: int            # bits per char within a key word
    words: int           # number of uint32 key words
    keys: np.ndarray     # (P, words) uint32, rows sorted lexicographically
    pos: np.ndarray      # (P,) uint32: global position in reduced concat
    frame: np.ndarray    # (P,) uint32: frame id of that position

    @property
    def chars_per_word(self) -> int:
        return 32 // self.bits

    @property
    def capacity(self) -> int:
        """Maximum seed/extension length representable by the keys."""
        return self.chars_per_word * self.words

    @property
    def num_positions(self) -> int:
        return len(self.pos)


def build_position_keys(concat: np.ndarray, offsets: np.ndarray,
                        bits: int, words: int) -> np.ndarray:
    """Pack, for every global position p, the next chars of its frame into
    ``words`` uint32 words (rank+1, MSB-first within the word, sentinel 0
    beyond the frame end)."""
    P = len(concat)
    cpw = 32 // bits
    span = cpw * words
    # frame end for every position
    frame_of_pos = np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets))
    frame_end = offsets[1:][frame_of_pos]  # (P,)
    valid_len = frame_end - np.arange(P, dtype=np.int64)

    arr1 = concat.astype(np.uint32) + 1
    padded = np.concatenate([arr1, np.zeros(span, dtype=np.uint32)])

    keys = np.zeros((P, words), dtype=np.uint32)
    for j in range(span):
        w = j // cpw
        c = np.where(j < valid_len, padded[j : j + P], 0).astype(np.uint32)
        keys[:, w] = (keys[:, w] << np.uint32(bits)) | c
    # left-align within each word so lexicographic uint32 compare works even
    # when bits doesn't divide 32 (e.g. 5-bit chars use the top 30 bits)
    shift = np.uint32(32 - cpw * bits)
    if shift:
        keys <<= shift
    return keys


def build_kmer_index(red_concat: np.ndarray, offsets: np.ndarray,
                     alphabet_size: int, words: int = 4) -> KmerIndex:
    bits = bits_for_alphabet(alphabet_size)
    from .. import native
    keys = native.pack_position_keys(red_concat, offsets, bits, words)
    if keys is None:
        keys = build_position_keys(red_concat, offsets, bits, words)
    # lexicographic sort; parallel native sort when available (np.lexsort
    # scales poorly past ~10M positions), np.lexsort fallback otherwise --
    # both stable, so the resulting index is identical
    order = native.sort_rows_u32(keys) if words <= 4 else None
    if order is None:
        # np.lexsort uses the LAST key as primary
        order = np.lexsort(tuple(keys[:, w] for w in reversed(range(words))))
    # pos[i] = arange(P)[order][i] == order[i]: no gather needed.
    # keys/frame gathers run parallel in the native lib (the reference
    # builds its index on all threads, mkindex_algo.hpp:600-618); numpy
    # fancy-indexing fallback is identical.
    sorted_keys = native.take_rows_u32(keys, order)
    if sorted_keys is None:
        sorted_keys = keys[order]
    frame = native.take_frame_of_pos(offsets, order)
    if frame is None:
        frame_of_pos = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets))
        frame = frame_of_pos[order].astype(np.uint32)
    return KmerIndex(
        alphabet_size=alphabet_size,
        bits=bits,
        words=words,
        keys=sorted_keys,
        pos=np.asarray(order, dtype=np.uint32),
        frame=frame,
    )
