"""Blast match/record assembly: frame arithmetic, alignment statistics,
filters, per-record sort/dedup semantics and LCA.

Ports from ``/root/reference/src/search_algo.hpp``:
* ``_setFrames`` (:768-814), ``_untrueQryId``/``_untrueSubjId`` (:940-996)
* e-value/bit-score filter ordering of ``iterateMatchesFullSimd``
  (:1252-1283, :1302-1325)
* ``_writeRecord`` sort/unique/cutoff/LCA (:820-913)
and the alignment statistics of SeqAn2 ``computeAlignmentStats`` incl. the
bisulfite override (``evaluate_bisulfite_alignment.hpp:26-119``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..index import taxonomy


@dataclasses.dataclass
class BlastMatch:
    n_q_id: int              # original (untranslated) query id, batch-global
    n_s_id: int              # original subject id
    q_frame_shift: int
    s_frame_shift: int
    q_length: int            # ORIGINAL query length (dna length for blastx)
    s_length: int            # original subject length
    # frame-space, 0-based half-open coordinates on the translated frames
    q_start: int
    q_end: int
    s_start: int
    s_end: int
    raw_score: int
    ops: list                # [(op, run)] with op in M/D/I (D = gap in query)
    # statistics (filled by compute_alignment_stats)
    align_length: int = 0
    num_matches: int = 0
    num_mismatches: int = 0
    num_gap_opens: int = 0
    num_gaps: int = 0
    num_insertions: int = 0
    num_deletions: int = 0
    num_positives: int = 0
    identity: float = 0.0
    similarity: float = 0.0
    bit_score: float = 0.0
    e_value: float = 0.0
    s_tax_ids: list = dataclasses.field(default_factory=list)
    # frame-level ids (internal)
    qry_frame_id: int = 0
    subj_frame_id: int = 0


def set_frames(qry_id: int, subj_id: int, program, red_alph: str):
    """_setFrames (search_algo.hpp:768-814): frame shifts from frame ids."""
    from .. import alphabets as ab

    if program.q_translated:
        q = (qry_id % 3) + 1
        if qry_id % 6 > 2:
            q = -q
    elif red_alph == ab.DNA3BS:
        q = (qry_id % 2) + 1
        if qry_id % 4 > 1:
            q = -q
    elif program.q_has_revcomp:
        q = 1 if qry_id % 2 == 0 else -1
    else:
        q = 0

    if program.s_translated:
        s = (subj_id % 3) + 1
        if subj_id % 6 > 2:
            s = -s
    elif red_alph == ab.DNA3BS:
        s = (subj_id % 2) + 1
    elif program.s_has_revcomp:
        s = 1 if subj_id % 2 == 0 else -1
    else:
        s = 0
    return q, s


def compute_alignment_stats(bm: BlastMatch, q_frame: np.ndarray,
                            s_frame: np.ndarray, subst: np.ndarray,
                            bs_mode: bool) -> None:
    """computeAlignmentStats over the aligned (clipped) region.

    Standard mode: match == character equality (SeqAn2 align_stats).
    Bisulfite mode: match == score(c0,c1) == score(c0,c0)
    (evaluate_bisulfite_alignment.hpp:97).  Gap opens follow the
    reference's column walk (prev-op state), so unmerged consecutive
    runs of the same gap op count one open."""
    i, j = bm.q_start, bm.s_start
    matches = mismatches = positives = 0
    gap_opens = gap_ext = insertions = deletions = 0
    length = 0
    prev = ""
    for op, run in bm.ops:
        length += run
        if op == "M":
            if i + run > len(q_frame) or j + run > len(s_frame):
                # a clean bounds failure instead of numpy slice clamping
                # silently miscounting pident/mismatches
                raise IndexError(
                    f"alignment ops overrun the frames: M-run to "
                    f"q[{i}:{i + run}] of {len(q_frame)} / "
                    f"s[{j}:{j + run}] of {len(s_frame)}")
            c0 = np.asarray(q_frame[i : i + run], dtype=np.int64)
            c1 = np.asarray(s_frame[j : j + run], dtype=np.int64)
            sc = subst[c0, c1]
            if bs_mode:
                is_match = sc == subst[c0, c0]
            else:
                is_match = c0 == c1
            nm = int(is_match.sum())
            matches += nm
            mismatches += run - nm
            positives += int((sc > 0).sum())
            i += run
            j += run
        elif op == "D":  # gap in query row
            if prev == "D":
                gap_ext += run
            else:
                gap_opens += 1
                gap_ext += run - 1
            deletions += run
            j += run
        else:  # 'I' gap in subject row
            if prev == "I":
                gap_ext += run
            else:
                gap_opens += 1
                gap_ext += run - 1
            insertions += run
            i += run
        prev = op
    bm.align_length = length
    bm.num_matches = matches
    bm.num_mismatches = mismatches
    bm.num_positives = positives
    bm.num_gap_opens = gap_opens
    bm.num_gaps = gap_opens + gap_ext
    bm.num_insertions = insertions
    bm.num_deletions = deletions
    bm.identity = 100.0 * matches / length if length else 0.0
    bm.similarity = 100.0 * positives / length if length else 0.0


def sort_dedup_cutoff(matches: list[BlastMatch], max_matches: int, stats):
    """_writeRecord list massaging (search_algo.hpp:832-874): sort by
    coordinates with bitScore desc, unique keeping best, sort by bitScore
    desc, cut to max_matches."""
    matches.sort(key=lambda m: (
        m.n_s_id, m.q_start, m.q_end, m.s_start, m.s_end,
        m.q_frame_shift, m.s_frame_shift, -m.bit_score))
    before = len(matches)
    out = []
    prev_key = None
    for m in matches:
        key = (m.n_s_id, m.q_start, m.q_end, m.s_start, m.s_end,
               m.q_frame_shift, m.s_frame_shift)
        if key != prev_key:
            out.append(m)
            prev_key = key
    stats.hits_duplicate2 += before - len(out)
    out.sort(key=lambda m: -m.bit_score)  # stable, like std::list::sort
    if len(out) > max_matches:
        stats.hits_abundant += len(out) - max_matches
        out = out[:max_matches]
    stats.hits_final += len(out)
    return out


def record_lca(matches: list[BlastMatch], s_tax_ids: list[list[int]],
               parents: np.ndarray, heights: np.ndarray, names: list[str]):
    """LCA over all matches' tax ids (_writeRecord, search_algo.hpp:885-909)."""
    # a taxid beyond the taxdump's id range (mapping file newer than the
    # tree) is treated as unassigned, like the reference's "Unassigned
    # subjects are simply ignored" — not an IndexError
    def in_tree(t: int) -> bool:
        return t < len(parents) and parents[t] != 0

    lca = 0
    for m in matches:
        tids = s_tax_ids[m.n_s_id]
        if tids and in_tree(tids[0]):
            lca = tids[0]
            break
    if lca != 0:
        for m in matches:
            for tid in s_tax_ids[m.n_s_id]:
                if in_tree(tid):
                    lca = taxonomy.compute_lca(parents, heights, tid, lca)
    name = names[lca] if names and lca < len(names) else ""
    return lca, name
