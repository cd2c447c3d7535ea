"""Frame generation: the TPU-native equivalent of the reference's lazy view
chains (``/root/reference/src/shared_definitions.hpp:246-281``
sbjTransView / qryTransView / redView).

Where the reference composes lazy zero-copy views, we materialize frames
into flat numpy arrays once per batch — frames then live on device as
padded tensors.  Frame *ordering* is identical to the reference so that
all id/frame arithmetic (``_setFrames``, ``_untrueQryId``/``_untrueSubjId``,
search_algo.hpp:768-996) carries over:

* translated: ids 0..5 = frames +1,+2,+3,-1,-2,-3 per original sequence
* nucleotide (revcomp): ids 0,1 = fwd, revcomp
* bisulfite query: ids 0..3 = fwd, fwd-dup, revcomp, revcomp-dup
  with reduction fwd/rev applied to even/odd frames
* bisulfite subject: ids 0,1 = dup copies, reduced fwd/rev
"""

from __future__ import annotations

import numpy as np

from . import alphabets as ab


def reduce_frames(trans_frames: list[np.ndarray], trans_alph: str,
                  red_alph: str) -> list[np.ndarray]:
    """redView (shared_definitions.hpp:270-281): one reduced frame per
    translated frame.  Like the reference's zero-copy views, returned
    frames may alias the inputs — treat all frame arrays as read-only."""
    if trans_alph == red_alph:
        return list(trans_frames)
    if trans_alph == ab.AMINO_ACID:
        tab = ab.REDUCTION_TABLES[(ab.AMINO_ACID, red_alph)]
        return [tab[f] for f in trans_frames]
    if red_alph == ab.DNA3BS:
        out = []
        for i, f in enumerate(trans_frames):
            d4 = ab.dna5_to_dna4_rand(f)
            tab = ab.DNA4_TO_BS_FWD if i % 2 == 0 else ab.DNA4_TO_BS_REV
            out.append(tab[d4])
        return out
    if red_alph == ab.DNA4:
        return [ab.dna5_to_dna4_rand(f) for f in trans_frames]
    raise ValueError(f"unsupported reduction {trans_alph} -> {red_alph}")


def subject_trans_frames(orig_seqs: list[np.ndarray], orig_alph: str,
                         trans_alph: str, red_alph: str,
                         genetic_code: int = 1) -> list[np.ndarray]:
    """sbjTransView (shared_definitions.hpp:246-255)."""
    if red_alph == ab.DNA3BS:
        # views::duplicate (view_duplicate.hpp): both entries alias the
        # same array — frames are read-only downstream, and the fwd/rev
        # BS reduction makes fresh arrays per parity anyway.
        out = []
        for s in orig_seqs:
            out.append(s)
            out.append(s)
        return out
    if orig_alph != trans_alph:  # dna5 -> aa27, 6 frames
        out = []
        for s in orig_seqs:
            out.extend(ab.six_frames(s, genetic_code))
        return out
    return list(orig_seqs)


def query_trans_frames(orig_seqs: list[np.ndarray], orig_alph: str,
                       trans_alph: str, red_alph: str,
                       genetic_code: int = 1) -> list[np.ndarray]:
    """qryTransView (shared_definitions.hpp:257-268)."""
    if red_alph == ab.DNA3BS:
        out = []
        for s in orig_seqs:
            rc = ab.reverse_complement(s, ab.DNA5)
            out.extend([s, s, rc, rc])  # duplicates alias (read-only)
        return out
    if red_alph in (ab.DNA4, ab.DNA5):  # nucleotide: fwd + revcomp
        out = []
        for s in orig_seqs:
            out.append(s)
            out.append(ab.reverse_complement(s, ab.DNA5))
        return out
    if orig_alph == trans_alph:  # protein query
        return list(orig_seqs)
    # dna query, protein search: 6-frame translation
    out = []
    for s in orig_seqs:
        out.extend(ab.six_frames(s, genetic_code))
    return out


def subject_frame_lengths(seq_lens: np.ndarray, orig_alph: str,
                          trans_alph: str, red_alph: str) -> np.ndarray:
    """Translated-frame lengths computed ARITHMETICALLY from original
    sequence lengths (no translation): lets a host know the global
    frame-length table — and therefore dbTotalLength for e-values
    (search_algo.hpp:317-319) — while materializing only its own
    shard's sequences (per-host memory sharding).  Must agree with
    :func:`subject_trans_frames` (tested)."""
    seq_lens = np.asarray(seq_lens, dtype=np.int64)
    if red_alph == ab.DNA3BS:
        return np.repeat(seq_lens, 2)
    if orig_alph != trans_alph:          # dna5 -> aa27, 6 frames
        out = np.empty(len(seq_lens) * 6, dtype=np.int64)
        for s in range(3):
            fl = np.maximum((seq_lens - s) // 3, 0)
            out[s::6] = fl
            out[3 + s::6] = fl
        return out
    return seq_lens.copy()


def concat_frames(frames: list[np.ndarray]):
    """Flatten a list of frames into (concat uint8, offsets int64,
    lengths int64).  offsets has len(frames)+1 entries.  Frames are
    already uint8 in every call path, so the concat is the only copy
    (peak host RSS ~2x, not 3x, the database size)."""
    lengths = np.array([len(f) for f in frames], dtype=np.int64)
    offsets = np.zeros(len(frames) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if frames:
        concat = np.concatenate(frames).astype(np.uint8, copy=False)
    else:
        concat = np.zeros(0, dtype=np.uint8)
    return concat, offsets, lengths
