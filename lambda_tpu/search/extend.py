"""Match widening/merging and SIMD-batched extension — TPU flavor.

Port of ``/root/reference/src/search_algo.hpp``:
* ``_widenMatch`` / ``_widenAndPreprocessMatches`` (:919-938, :1136-1175)
  as vectorized numpy (host): widen every seed match to the full query
  frame plus a sqrt-band margin on the subject, sort, merge overlaps,
  swallow, dedup.
* ``iterateMatchesFullSimd`` (:1178-1332) two-pass extension: score-only
  pass over all candidates -> bit-score/e-value filter -> traceback pass
  for survivors.  Instead of sorting by length to minimize SIMD padding
  (:1229-1235), candidates are bucketed by padded (qlen, slen) shape
  class, which serves the same purpose on a rectangular machine.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sw_xla, sw_pallas


def _score_kernel() -> str:
    """Score-pass backend: 'pallas' (device kernel) on TPU backends,
    'native' (C++ host) on CPU, 'xla' (scan kernel) as the last resort.
    LAMBDA_SW_KERNEL=pallas|native|xla overrides."""
    mode = os.environ.get("LAMBDA_SW_KERNEL", "auto")
    if mode in ("pallas", "native", "xla"):
        return mode
    if jax.default_backend() not in ("cpu",):
        return "pallas"
    from .. import native
    return "native" if native.get_lib() is not None else "xla"


def _use_pallas() -> bool:
    return _score_kernel() == "pallas"


def band_size(qlen: int | np.ndarray):
    """sqrt-band margin (search_misc.hpp:46-50)."""
    return np.sqrt(qlen).astype(np.int64) + 1 if isinstance(qlen, np.ndarray) \
        else int(np.sqrt(qlen)) + 1


@dataclasses.dataclass
class MatchBatch:
    """Columnar match arrays (frame-level ids, trans-space coordinates).

    ``d_lo``/``d_hi`` (set by :func:`widen_and_merge`) are the extension
    band in absolute diagonals (subjectPos - queryPos): the banded SW
    semantics restrict extension to cells on diagonals in [d_lo, d_hi] —
    the band the reference's widener *intended* but could not enforce
    (search_algo.hpp:1102, search_misc.hpp:46-50).  Bands are per-match
    state so results are independent of batching/sharding/grouping.
    """

    qry_id: np.ndarray    # frame-level query id (within batch: q*F + f)
    subj_id: np.ndarray   # frame-level subject id (global)
    qry_start: np.ndarray
    qry_end: np.ndarray
    subj_start: np.ndarray
    subj_end: np.ndarray
    d_lo: np.ndarray | None = None
    d_hi: np.ndarray | None = None

    def __len__(self):
        return len(self.qry_id)

    def take(self, idx):
        return MatchBatch(*(None if a is None else a[idx]
                            for a in self._arrays()))

    def _arrays(self):
        return (self.qry_id, self.subj_id, self.qry_start, self.qry_end,
                self.subj_start, self.subj_end, self.d_lo, self.d_hi)


def widen_and_merge(m: MatchBatch, q_lens: np.ndarray, s_lens: np.ndarray,
                    stats=None) -> MatchBatch:
    """_widenMatch + _widenAndPreprocessMatches (exact port, vectorized),
    plus the extension-band computation: each seed's band is its seed
    diagonal +- the sqrt-band margin; merged matches union their seeds'
    bands."""
    if len(m) == 0:
        return m
    qlen = q_lens[m.qry_id]
    slen = s_lens[m.subj_id]

    # extension band around the seed diagonal (clamped to real cells)
    c = m.subj_start - m.qry_start
    band = band_size(qlen)
    d_lo = np.maximum(c - band, 1 - qlen)
    d_hi = np.minimum(c + band, slen - 1)
    d_hi = np.maximum(d_hi, d_lo)

    # move sStart left to cover the query prefix
    subj_start = np.where(m.subj_start < m.qry_start, 0,
                          m.subj_start - m.qry_start)
    qry_start = np.zeros_like(m.qry_start)
    qry_end = qlen.astype(m.qry_end.dtype)
    subj_end = np.minimum(subj_start + qlen + band, slen)
    subj_start = np.where(band < subj_start, subj_start - band, 0)

    order = np.lexsort((subj_end, subj_start, qry_end, qry_start,
                        m.subj_id, m.qry_id))
    qid = m.qry_id[order]
    sid = m.subj_id[order]
    qs, qe = qry_start[order], qry_end[order]
    ss_, se = subj_start[order], subj_end[order]
    dlo, dhi = d_lo[order], d_hi[order]

    before = len(qid)
    if stats is not None and before > 1:
        # merge-pass events (pass-1 condition evaluated on the pre-merge
        # rows is exact: the cascade never touches the values a later
        # step's condition reads) — the hitsMerged funnel counter
        same = (qid[:-1] == qid[1:]) & (sid[:-1] == sid[1:])
        stats.hits_merged += int((same & (se[:-1] >= ss_[1:])).sum())
    from .. import native
    if native.get_lib() is not None:
        arrs = [np.ascontiguousarray(a, dtype=np.int64)
                for a in (qid, sid, qs, qe, ss_, se, dlo, dhi)]
        keep = native.merge_passes(*arrs)
        qid, sid, qs, qe, ss_, se, dlo, dhi = arrs
    else:
        # pairwise merge left->right (search_algo.hpp:1148-1158): same pair
        # and l.subjEnd >= r.subjStart
        #   -> l.subjEnd = r.subjEnd; r.subjStart = l.subjStart
        for i in range(len(qid) - 1):
            if qid[i] == qid[i + 1] and sid[i] == sid[i + 1] \
                    and se[i] >= ss_[i + 1]:
                se[i] = se[i + 1]
                ss_[i + 1] = ss_[i]
                dlo[i] = dlo[i + 1] = min(dlo[i], dlo[i + 1])
                dhi[i] = dhi[i + 1] = max(dhi[i], dhi[i + 1])
        # pairwise swallow right->left (:1160-1169):
        # r.subjStart < l.subjEnd -> l = r
        for i in range(len(qid) - 2, -1, -1):
            if qid[i] == qid[i + 1] and sid[i] == sid[i + 1] \
                    and ss_[i + 1] < se[i]:
                qs[i], qe[i] = qs[i + 1], qe[i + 1]
                ss_[i], se[i] = ss_[i + 1], se[i + 1]
                dlo[i] = min(dlo[i], dlo[i + 1])
                dhi[i] = max(dhi[i], dhi[i + 1])
        # unique
        rows = np.stack([qid, sid, qs, qe, ss_, se], axis=1)
        keep = np.ones(len(qid), dtype=bool)
        keep[1:] = (rows[1:] != rows[:-1]).any(axis=1)
    if stats is not None:
        stats.hits_duplicate += int(before - keep.sum())
    return MatchBatch(qid[keep], sid[keep], qs[keep], qe[keep],
                      ss_[keep], se[keep], dlo[keep], dhi[keep])


_BUCKETS = [16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
            1536, 2048, 3072, 4096, 6144, 8192]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return int(n)


# band sizes bucket so the kernel's per-alignment width Ws = Dbk+1 is
# exactly a multiple of 8 (no double padding; packing P = 128//Ws stays
# tight) — band width multiplies kernel cost directly, so tight buckets
# matter more here than for query lengths
_D_BUCKETS = [7, 15, 23, 31, 39, 47, 63, 79, 95, 127, 159, 191, 255,
              319, 383, 511, 767, 1023]


def _bucket_d(n: int) -> int:
    for b in _D_BUCKETS:
        if n <= b:
            return b
    return int(-(-(n + 1) // 8) * 8) - 1


_QB_ARR = np.asarray(_BUCKETS, dtype=np.int64)
_DB_ARR = np.asarray(_D_BUCKETS, dtype=np.int64)


def _bucket_codes(qlen, d_row):
    """Vectorized (_bucket, _bucket_d) over match arrays (the scalar
    helpers are Python-loop hot-path poison at 10k+ matches)."""
    qlen = np.asarray(qlen, dtype=np.int64)
    d_row = np.asarray(d_row, dtype=np.int64)
    qi = np.searchsorted(_QB_ARR, qlen, side="left")
    qb = np.where(qi < len(_QB_ARR), _QB_ARR[np.minimum(qi, len(_QB_ARR) - 1)],
                  qlen)
    di = np.searchsorted(_DB_ARR, d_row, side="left")
    db_fb = (-(-(d_row + 1) // 8) * 8) - 1
    db = np.where(di < len(_DB_ARR), _DB_ARR[np.minimum(di, len(_DB_ARR) - 1)],
                  db_fb)
    return qb.astype(np.int64), db.astype(np.int64)


def bucket_groups(qlen, d_row, rev) -> dict:
    """Group match indices by padded (qlen bucket, band bucket, rev
    matrix) shape class — the ONE definition of the extension dispatch
    key, shared by the host/device bucketed paths (extend) and the
    sharded mesh path (pipeline._sharded_scores) so padding/bucketing
    changes cannot silently diverge between them.  Fully vectorized
    (searchsorted + argsort); keys are python ints/bool."""
    n = len(qlen)
    if n == 0:
        return {}
    qb, db = _bucket_codes(qlen, d_row)
    rev = np.asarray(rev).astype(np.int64)
    key = (qb << 33) | (db << 1) | rev
    order = np.argsort(key, kind="stable")
    uniq, starts = np.unique(key[order], return_index=True)
    groups: dict = {}
    bounds = list(starts) + [n]
    for u, lo, hi in zip(uniq, bounds[:-1], bounds[1:]):
        i0 = order[lo]
        groups[(int(qb[i0]), int(db[i0]), bool(rev[i0]))] = \
            order[lo:hi].tolist()
    return groups


def trace_pass(m: MatchBatch, q_frames, s_window, subst_ext_fwd,
               subst_ext_rev, gap_first, gap_extend, bs_split: bool):
    """Pass 2 with the COMPILED per-match tail when available.

    The reference's equivalent tail — traceback + computeAlignmentStats —
    is compiled C++ on all cores (search_algo.hpp:1296,1302-1325); here
    the native walker computes the alignment statistics inline with the
    banded host DP so no per-op Python walk remains.  Returns
    (scores, traces, stats) where stats is the (B, 8) int32 array
    [align_length, matches, mismatches, positives, gap_opens, gaps,
    insertions, deletions] (records.compute_alignment_stats semantics),
    or None when the native lib is unavailable / LAMBDA_SW_TRACE=device
    forces the device-dirs path (callers then compute stats per match in
    Python — the byte-identical fallback)."""
    from .. import native

    if (native.get_lib() is None
            or os.environ.get("LAMBDA_SW_TRACE") == "device"):
        sc, tr = _run_bucketed(m, q_frames, s_window, subst_ext_fwd,
                               subst_ext_rev, gap_first, gap_extend,
                               bs_split, with_trace=True)
        return sc, tr, None

    if len(m) == 0:
        return (np.zeros(0, np.int64), [],
                np.zeros((0, 8), np.int32))
    args, kw = _host_sw_args(m, q_frames, s_window, subst_ext_fwd,
                             subst_ext_rev, gap_first, gap_extend, bs_split)
    sc, tr, _, _, stats = native.sw_traceback_stats_batch(
        *args, **kw, bs_mode=bs_split)
    return sc, tr, stats


class SubjectWindows:
    """Extracts subject windows from the translated subject concat."""

    def __init__(self, trans_concat: np.ndarray, offsets: np.ndarray):
        self.concat = trans_concat
        self.offsets = offsets

    def window(self, subj_id: int, start: int, end: int) -> np.ndarray:
        o = int(self.offsets[subj_id])
        return self.concat[o + start : o + end]

    def window_virtual(self, subj_id: int, start: int, length: int,
                       pad_rank: int) -> np.ndarray:
        """Virtual extension window: subject positions [start, start+length)
        where out-of-subject positions are PAD rank.  ``start`` may be
        negative (band poking left of the subject) — the banded extension
        windows are [d_lo, d_hi + qlen) in subject coordinates."""
        o = int(self.offsets[subj_id])
        slen = int(self.offsets[subj_id + 1]) - o
        out = np.full(length, pad_rank, dtype=np.int32)
        lo = max(start, 0)
        hi = min(start + length, slen)
        if hi > lo:
            out[lo - start : hi - start] = self.concat[o + lo : o + hi]
        return out


def _host_sw_args(m: MatchBatch, q_frames, s_window, subst_ext_fwd,
                  subst_ext_rev, gap_first, gap_extend, bs_split: bool):
    """Ragged inputs for the native host SW entry points (one contract
    shared by the score, traceback and traceback+stats paths): per-match
    query/virtual-subject rank lists, matrices, per-row band, bisulfite
    matrix-selection flags."""
    n = len(m)
    pad = subst_ext_fwd.shape[0] - 1
    _, d_row, wlen = _ext_geometry(m)
    q_list = [q_frames[m.qry_id[i]][m.qry_start[i]:m.qry_end[i]]
              for i in range(n)]
    s_list = [s_window.window_virtual(int(m.subj_id[i]), int(m.d_lo[i]),
                                      int(wlen[i]), pad)
              for i in range(n)]
    rev = (np.asarray(m.subj_id) % 2 == 1).astype(np.uint8) \
        if bs_split else None
    args = (q_list, s_list, np.asarray(subst_ext_fwd, dtype=np.int32),
            gap_first, gap_extend)
    kw = dict(subst_rev=(np.asarray(subst_ext_rev, dtype=np.int32)
                         if bs_split else None),
              use_rev=rev, band=d_row.astype(np.int32))
    return args, kw


def _ext_geometry(m: MatchBatch):
    """Banded extension-window geometry per match: window start =
    d_lo (subject coords, may poke outside the subject -> PAD), window
    length = qlen + D, band [0, D] in window coordinates."""
    qlen = (m.qry_end - m.qry_start).astype(np.int64)
    d_row = (m.d_hi - m.d_lo).astype(np.int64)
    wlen = qlen + d_row
    return qlen, d_row, wlen


def _run_bucketed(m, q_frames, s_window, subst_ext_fwd, subst_ext_rev,
                  gap_first, gap_extend, bs_split, with_trace, stats=None):
    n = len(m)
    scores = np.zeros(n, dtype=np.int64)
    traces: list = [None] * n
    if n == 0:
        return scores, traces

    pad = subst_ext_fwd.shape[0] - 1  # PAD rank
    qlen, d_row, wlen = _ext_geometry(m)

    def q_of(i):
        return q_frames[m.qry_id[i]][m.qry_start[i]:m.qry_end[i]]

    def s_of(i):
        return s_window.window_virtual(int(m.subj_id[i]), int(m.d_lo[i]),
                                       int(wlen[i]), pad)

    from .. import native
    use_native = native.get_lib() is not None
    pallas_mode = _use_pallas()
    # LAMBDA_SW_TRACE=device must actually force the device-dirs
    # traceback (its whole purpose is bypassing the native walker)
    force_dev_trace = os.environ.get("LAMBDA_SW_TRACE") == "device"
    if use_native and not pallas_mode and \
            ((with_trace and not force_dev_trace)
             or (not with_trace and _score_kernel() == "native")):
        # host path (OpenMP C++, banded, ragged): the traceback pass
        # (search_algo.hpp:1296 equivalent) or the score pass on CPU
        # backends.  Identical banded semantics to the device kernels.
        args, kw = _host_sw_args(m, q_frames, s_window, subst_ext_fwd,
                                 subst_ext_rev, gap_first, gap_extend,
                                 bs_split)
        if with_trace:
            # pass 2 is exact DP on every backend: with X-drop the pallas
            # flow also reports survivors' exact scores (trace_pass tail)
            return native.sw_traceback_batch(*args, **kw)
        from ..ops import sw_band
        if sw_band._XDROP:
            # replicate the lane kernel's chunk-granular X-drop with each
            # match's own bucket-plan chunk size, so CPU (native) and TPU
            # (pallas) backends score pass 1 identically (nc depends only
            # on the (qbk, dbk) bucket pair — memoized, not per-match)
            qb, db = _bucket_codes(qlen, d_row)
            nc_of = {pair: sw_band._plan(int(pair[0] + pair[1]),
                                         int(pair[1]))[3]
                     for pair in set(zip(qb.tolist(), db.tolist()))}
            ncs = np.array([nc_of[p] for p in zip(qb.tolist(), db.tolist())],
                           dtype=np.int32)
            kw.update(nc=ncs, x_drop=sw_band._XDROP)
        if stats is not None:
            stats.ext_dispatches += 1
            stats.ext_dispatch_rows += n
        return native.sw_score_batch(*args, **kw), traces

    # bisulfite: odd subject frames use the reverse matrix
    rev = (m.subj_id % 2 == 1) if bs_split else np.zeros(n, dtype=bool)
    group_keys = bucket_groups(qlen, d_row, rev)

    use_pallas = pallas_mode
    if use_pallas:
        from ..ops import sw_band
        e8_fwd = sw_pallas.ext8_from_ext32(subst_ext_fwd)
        e8_rev = sw_pallas.ext8_from_ext32(subst_ext_rev)
        dev_fwd = dev_rev = None
    else:
        dev_fwd = jnp.asarray(subst_ext_fwd)
        dev_rev = jnp.asarray(subst_ext_rev)

    for (qbk, dbk, r), idxs in _fuse_dispatch_groups(group_keys):
        B = len(idxs)
        if stats is not None and not with_trace:
            stats.ext_dispatches += 1
            stats.ext_dispatch_rows += B
        sbk = qbk + dbk
        if use_pallas:
            # same banded-image HBM preflight as sw_scores_device —
            # fusion-merged groups have the widest bands, so this path
            # can build the largest images of all
            _warn_image_hbm(B, sw_band._plan(sbk, dbk)[0], dbk)
        qarr = np.full((B, qbk), pad, dtype=np.int32)
        sarr = np.full((B, sbk), pad, dtype=np.int32)
        darr = np.zeros(B, dtype=np.int32)
        for bi, i in enumerate(idxs):
            qarr[bi, : qlen[i]] = q_of(i)
            sarr[bi, : wlen[i]] = s_of(i)
            darr[bi] = d_row[i]
        if with_trace and use_pallas:
            # device traceback: banded direction bits emitted by the
            # Pallas kernel, walked on host (search_algo.hpp:1296; no
            # native-lib dependency on the correctness path)
            sc, tr = sw_band.sw_band_align_pallas(
                qarr, sarr, darr, e8_rev if r else e8_fwd,
                gap_first, gap_extend)
            for bi2, i in enumerate(idxs):
                scores[i] = sc[bi2]
                traces[i] = tr[bi2]
        elif with_trace:
            mat = dev_rev if r else dev_fwd
            best, bi_, bj_, dirs = sw_xla.sw_align_batch(
                jnp.asarray(qarr), jnp.asarray(sarr), mat, gap_first,
                gap_extend, band_d=jnp.asarray(darr))
            best, bi_, bj_ = map(np.asarray, (best, bi_, bj_))
            dirs = np.asarray(dirs)
            for bi2, i in enumerate(idxs):
                scores[i] = best[bi2]
                if best[bi2] > 0:
                    q0, s0, ops = sw_xla.traceback(
                        dirs, bi2, int(bi_[bi2]), int(bj_[bi2]))
                    traces[i] = (q0, s0, ops)
        elif use_pallas:
            scores[idxs] = sw_band.sw_band_score_pallas(
                qarr, sarr, darr, e8_rev if r else e8_fwd,
                gap_first, gap_extend)
        else:
            from ..ops import sw_band
            mat = dev_rev if r else dev_fwd
            if sw_band._XDROP:
                # pure-XLA chunk-granular X-drop (no early exit,
                # identical scores): the group's bucket-plan chunk size,
                # same formula as the native wiring above — with X-drop
                # on, fusion is gated off so the group is a pure
                # (qbk, dbk) class
                plan_nc = sw_band._plan(qbk + dbk, dbk)[3]
                best = sw_xla.sw_xdrop_score_batch(
                    jnp.asarray(qarr), jnp.asarray(sarr), mat, gap_first,
                    gap_extend, jnp.asarray(darr),
                    jnp.full(B, plan_nc, np.int32), sw_band._XDROP)
            else:
                best, _, _ = sw_xla.sw_score_batch(
                    jnp.asarray(qarr), jnp.asarray(sarr), mat, gap_first,
                    gap_extend, band_d=jnp.asarray(darr))
            scores[idxs] = np.asarray(best)
    return scores, traces


# ---------------------------------------------------------------------------
# Device-resident score pass: windows gathered on device from the resident
# query-frame/subject tensors; only match coordinates go host->device and
# only scores come back.
# ---------------------------------------------------------------------------

import functools

_hbm_warned = False


def _warn_image_hbm(B: int, N: int, D: int) -> None:
    """Warn once when a bucket's banded substitution image is likely to
    exhaust device memory (the transient the round-2 preflight missed —
    checkRAM device analogue, search_algo.hpp:126-155)."""
    global _hbm_warned
    if _hbm_warned:
        return
    from ..ops import sw_band

    need = sw_band.image_bytes(B, N, D)
    if need < (1 << 29):                  # < 512 MiB: never worth a check
        return
    try:
        limit = jax.devices()[0].memory_stats().get("bytes_limit", 0)
    except Exception:
        limit = 0
    if limit and need > 0.5 * limit:
        _hbm_warned = True
        print(f"WARNING: extension bucket (B={B}, N={N}, band={D}) needs "
              f"a ~{need >> 20} MiB substitution image of ~{limit >> 20} "
              "MiB device memory; reduce --query-batch-size or shard the "
              "database over more devices.")


def _fuse_params():
    """(fixed_dispatch_seconds, seconds_per_padded_cell) for the dispatch
    fusion cost model.  Defaults from the round-2 kernel measurements:
    ~0.6-1.3 ms fixed cost per kernel dispatch (image setup + Mosaic
    launch) and ~1e10 padded band cells/s sustained; tune with
    LAMBDA_SWB_FUSE_FIXED_US / LAMBDA_SWB_CELL_PS."""
    fixed = float(os.environ.get("LAMBDA_SWB_FUSE_FIXED_US", "1500")) * 1e-6
    cell = float(os.environ.get("LAMBDA_SWB_CELL_PS", "100")) * 1e-12
    return fixed, cell


def _fuse_dispatch_groups(group_keys: dict) -> list:
    """Merge (qlen-bucket, band-bucket) shape classes into FEWER kernel
    dispatches when the modeled cost of the extra padding is below the
    fixed per-dispatch cost.

    The reference extends every match in one OpenMP loop
    (search_algo.hpp:1242-1289); the TPU design buckets matches into
    padded shape classes, and at pipeline-sized batches those classes
    fragment into many small dispatches that each pay the fixed kernel
    dispatch cost (and, on remote-attached links, the host dispatch
    latency).  Greedily merge class pairs while the modeled total cost
    decreases.  With X-drop off, padding provably cannot change scores
    (PAD scores -128 against everything; asserted by the backend/batch
    invariance tests).

    Gating: fusion applies only on the Pallas banded path (the cost
    model is the measured lane-kernel one; the XLA fallback pays
    O(qbk*(qbk+dbk)) rectangles where merged padding would inflate
    work) and only with X-drop OFF (merging changes the kernel's column
    chunk size NC, and the X-drop check is chunk-granular — fusing
    would make opt-in X-drop scores depend on batch composition).
    LAMBDA_SWB_FUSE: 0 = off, 1/auto = as described, force = always
    (tests exercise the planner on the CPU backends with it).

    Returns [((qbk, dbk, rev), idx_array), ...] deterministically
    ordered."""
    from ..ops import sw_band

    groups = {k: list(v) for k, v in group_keys.items()}
    mode = os.environ.get("LAMBDA_SWB_FUSE", "1")
    # the X-drop gate must read the LATCHED sw_band._XDROP (what the
    # kernels actually honor), not the live env: if they disagree the
    # planner could merge shape classes while the kernel applies
    # chunk-granular X-drop — the batch-composition dependence this
    # gate exists to prevent
    fusable = (mode == "force"
               or (mode != "0" and _use_pallas() and not sw_band._XDROP))
    if not fusable or len(groups) <= 1:
        return [(k, np.asarray(sorted(v)))
                for k, v in sorted(groups.items())]
    fixed, cell = _fuse_params()

    def gcost(qbk, dbk, nb):
        N, W, BROWS, _, _ = sw_band._plan(qbk + dbk, dbk)
        return fixed + sw_band._ceil(nb, BROWS) * N * W * cell

    while len(groups) > 1:
        best = None  # (delta, merged_key, key_a, key_b)
        keys = sorted(groups)
        for ai in range(len(keys)):
            for bi in range(ai + 1, len(keys)):
                (qa, da, ra), (qb_, db_, rb) = keys[ai], keys[bi]
                if ra != rb:
                    continue
                mk = (max(qa, qb_), max(da, db_), ra)
                na, nb = len(groups[keys[ai]]), len(groups[keys[bi]])
                delta = (gcost(mk[0], mk[1], na + nb)
                         - gcost(qa, da, na) - gcost(qb_, db_, nb))
                if delta < 0 and (best is None or delta < best[0]):
                    best = (delta, mk, keys[ai], keys[bi])
        if best is None:
            break
        _, mk, ka, kb = best
        merged = groups.pop(ka) + groups.pop(kb)
        groups.setdefault(mk, []).extend(merged)
    return [(k, np.asarray(sorted(v))) for k, v in sorted(groups.items())]


@functools.partial(jax.jit, static_argnames=("N", "D", "gap_first",
                                             "gap_extend"))
def _device_score_bucket(trans_q, trans_sbj, sbj_offsets, sbj_lens,
                         qry_id, qry_start, qry_len, subj_id, d_lo,
                         d_row, subst_ext8, N, D, gap_first, gap_extend):
    """One banded bucket, fully on device: gather the query rows and the
    VIRTUAL subject windows (start d_lo, length qlen + d_row; positions
    outside the subject -> PAD), then run the banded Pallas kernel."""
    from ..ops import sw_band

    pad = subst_ext8.shape[0] - 1
    iq = jnp.arange(N, dtype=jnp.int32)
    qidx = qry_start[:, None] + iq[None, :]
    qwin = trans_q[jnp.clip(qry_id, 0, trans_q.shape[0] - 1)[:, None],
                   jnp.clip(qidx, 0, trans_q.shape[1] - 1)]
    qwin = jnp.where(iq[None, :] < qry_len[:, None], qwin, pad)

    sid = jnp.clip(subj_id, 0, sbj_offsets.shape[0] - 1)
    spos = d_lo[:, None] + iq[None, :]           # subject coords
    sval = (spos >= 0) & (spos < sbj_lens[sid][:, None]) \
        & (iq[None, :] < (qry_len + d_row)[:, None])
    sabs = sbj_offsets[sid][:, None] + spos
    swin = trans_sbj[jnp.clip(sabs, 0, trans_sbj.shape[0] - 1)] \
        .astype(jnp.int32)
    swin = jnp.where(sval, swin, pad)

    return sw_band.sw_band_score_device(qwin.astype(jnp.int32), swin,
                                        d_row, subst_ext8, D,
                                        gap_first, gap_extend)


def sw_scores_device(m: MatchBatch, d_trans_q, d_trans_sbj, d_sbj_offsets,
                     d_sbj_lens, e8_fwd, e8_rev, gap_first, gap_extend,
                     bs_split: bool, stats=None) -> np.ndarray:
    """Pass-1 banded scores with device-side window gathering.  Matches
    are bucketed by padded (qlen, band) shape class like the host path;
    each bucket is one fused dispatch (gather -> sheared band image ->
    banded Pallas DP).  ``stats`` (a StatsHolder) records per-dispatch
    alignment counts — the kernel's operating point (GCUPS vs B curve,
    docs/PERF.md §1) is set by these, so the funnel report can show
    whether the pipeline feeds the kernel its efficient regime."""
    from ..ops import sw_band

    n = len(m)
    scores = np.zeros(n, dtype=np.int64)
    if n == 0:
        return scores
    qlen, d_row, wlen = _ext_geometry(m)
    rev = (m.subj_id % 2 == 1) if bs_split else np.zeros(n, dtype=bool)
    group_keys = bucket_groups(qlen, d_row, rev)
    pending = []          # dispatch ALL buckets first, then sync once
    for (qbk, dbk, r), idxs in _fuse_dispatch_groups(group_keys):
        if stats is not None:
            stats.ext_dispatches += 1
            stats.ext_dispatch_rows += len(idxs)
        N, W, BTL, _, _ = sw_band._plan(qbk + dbk, dbk)
        Bp = sw_band._ceil(len(idxs), BTL)
        _warn_image_hbm(Bp, N, dbk)

        def pad_i32(a, fill=0):
            out = np.full(Bp, fill, dtype=np.int32)
            out[:len(idxs)] = a[idxs]
            return jnp.asarray(out)

        # d_row = -1 sentinel on batch-padding rows: no in-band lane, so
        # pad rows score 0 AND never hold an X-drop tile alive
        out = _device_score_bucket(
            d_trans_q, d_trans_sbj, d_sbj_offsets, d_sbj_lens,
            pad_i32(m.qry_id), pad_i32(m.qry_start), pad_i32(qlen),
            pad_i32(m.subj_id), pad_i32(m.d_lo), pad_i32(d_row, fill=-1),
            jnp.asarray(e8_rev if r else e8_fwd),
            N, dbk, int(gap_first), int(gap_extend))
        pending.append((idxs, out))
    # single host sync point: per-bucket np.asarray() inside the loop
    # would serialize one full dispatch+link round-trip per bucket
    for idxs, out in pending:
        scores[idxs] = np.asarray(out)[:len(idxs)]
    return scores
