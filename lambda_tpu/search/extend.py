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
    """Columnar match arrays (frame-level ids, trans-space coordinates)."""

    qry_id: np.ndarray    # frame-level query id (within batch: q*F + f)
    subj_id: np.ndarray   # frame-level subject id (global)
    qry_start: np.ndarray
    qry_end: np.ndarray
    subj_start: np.ndarray
    subj_end: np.ndarray

    def __len__(self):
        return len(self.qry_id)

    def take(self, idx):
        return MatchBatch(*(a[idx] for a in self._arrays()))

    def _arrays(self):
        return (self.qry_id, self.subj_id, self.qry_start, self.qry_end,
                self.subj_start, self.subj_end)


def widen_and_merge(m: MatchBatch, q_lens: np.ndarray, s_lens: np.ndarray,
                    stats=None) -> MatchBatch:
    """_widenMatch + _widenAndPreprocessMatches (exact port, vectorized)."""
    if len(m) == 0:
        return m
    qlen = q_lens[m.qry_id]
    slen = s_lens[m.subj_id]

    # move sStart left to cover the query prefix
    subj_start = np.where(m.subj_start < m.qry_start, 0,
                          m.subj_start - m.qry_start)
    qry_start = np.zeros_like(m.qry_start)
    qry_end = qlen.astype(m.qry_end.dtype)
    band = band_size(qlen)
    subj_end = np.minimum(subj_start + qlen + band, slen)
    subj_start = np.where(band < subj_start, subj_start - band, 0)

    order = np.lexsort((subj_end, subj_start, qry_end, qry_start,
                        m.subj_id, m.qry_id))
    qid = m.qry_id[order]
    sid = m.subj_id[order]
    qs, qe = qry_start[order], qry_end[order]
    ss_, se = subj_start[order], subj_end[order]

    before = len(qid)
    from .. import native
    if native.get_lib() is not None:
        arrs = [np.ascontiguousarray(a, dtype=np.int64)
                for a in (qid, sid, qs, qe, ss_, se)]
        keep = native.merge_passes(*arrs)
        qid, sid, qs, qe, ss_, se = arrs
    else:
        # pairwise merge left->right (search_algo.hpp:1148-1158): same pair
        # and l.subjEnd >= r.subjStart
        #   -> l.subjEnd = r.subjEnd; r.subjStart = l.subjStart
        for i in range(len(qid) - 1):
            if qid[i] == qid[i + 1] and sid[i] == sid[i + 1] \
                    and se[i] >= ss_[i + 1]:
                se[i] = se[i + 1]
                ss_[i + 1] = ss_[i]
        # pairwise swallow right->left (:1160-1169):
        # r.subjStart < l.subjEnd -> l = r
        for i in range(len(qid) - 2, -1, -1):
            if qid[i] == qid[i + 1] and sid[i] == sid[i + 1] \
                    and ss_[i + 1] < se[i]:
                qs[i], qe[i] = qs[i + 1], qe[i + 1]
                ss_[i], se[i] = ss_[i + 1], se[i + 1]
        # unique
        rows = np.stack([qid, sid, qs, qe, ss_, se], axis=1)
        keep = np.ones(len(qid), dtype=bool)
        keep[1:] = (rows[1:] != rows[:-1]).any(axis=1)
    if stats is not None:
        stats.hits_duplicate += int(before - keep.sum())
    return MatchBatch(qid[keep], sid[keep], qs[keep], qe[keep],
                      ss_[keep], se[keep])


_BUCKETS = [16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
            1536, 2048, 3072, 4096, 6144, 8192]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return int(n)


def sw_extend_scores(m: MatchBatch, q_frames: list[np.ndarray],
                     s_window: "SubjectWindows", subst_ext_fwd: np.ndarray,
                     subst_ext_rev: np.ndarray, gap_first: int, gap_extend: int,
                     bs_split: bool) -> np.ndarray:
    """Pass 1: scores for all matches.  Returns int array of raw scores."""
    return _run_bucketed(m, q_frames, s_window, subst_ext_fwd, subst_ext_rev,
                         gap_first, gap_extend, bs_split, with_trace=False)[0]


def sw_extend_traceback(m: MatchBatch, q_frames, s_window,
                        subst_ext_fwd, subst_ext_rev, gap_first, gap_extend,
                        bs_split: bool):
    """Pass 2: scores + alignment ops for all matches.

    Returns (scores, list of (q_start, s_start, ops)) in match order, with
    coordinates relative to (qry_start, subj_start) of each match."""
    return _run_bucketed(m, q_frames, s_window, subst_ext_fwd, subst_ext_rev,
                         gap_first, gap_extend, bs_split, with_trace=True)


class SubjectWindows:
    """Extracts subject windows from the translated subject concat."""

    def __init__(self, trans_concat: np.ndarray, offsets: np.ndarray):
        self.concat = trans_concat
        self.offsets = offsets

    def window(self, subj_id: int, start: int, end: int) -> np.ndarray:
        o = int(self.offsets[subj_id])
        return self.concat[o + start : o + end]


def _run_bucketed(m, q_frames, s_window, subst_ext_fwd, subst_ext_rev,
                  gap_first, gap_extend, bs_split, with_trace):
    n = len(m)
    scores = np.zeros(n, dtype=np.int64)
    traces: list = [None] * n
    if n == 0:
        return scores, traces

    from .. import native
    if not with_trace and _score_kernel() == "native" \
            and native.get_lib() is not None:
        # CPU backends: score pass on the host (OpenMP), no padding needed
        q_list = [q_frames[m.qry_id[i]][m.qry_start[i]:m.qry_end[i]]
                  for i in range(n)]
        s_list = [s_window.window(int(m.subj_id[i]), int(m.subj_start[i]),
                                  int(m.subj_end[i])) for i in range(n)]
        rev = (np.asarray(m.subj_id) % 2 == 1).astype(np.uint8) \
            if bs_split else None
        scores = native.sw_score_batch(
            q_list, s_list, np.asarray(subst_ext_fwd, dtype=np.int32),
            gap_first, gap_extend,
            subst_rev=(np.asarray(subst_ext_rev, dtype=np.int32)
                       if bs_split else None),
            use_rev=rev)
        return scores, traces

    if with_trace:
        # traceback pass over the few survivors: native C++ host DP
        # (search_algo.hpp:1296 equivalent); identical semantics to the
        # device/XLA path, without shipping direction matrices off-device
        if native.get_lib() is not None:
            q_list = [q_frames[m.qry_id[i]][m.qry_start[i]:m.qry_end[i]]
                      for i in range(n)]
            s_list = [s_window.window(int(m.subj_id[i]), int(m.subj_start[i]),
                                      int(m.subj_end[i])) for i in range(n)]
            rev = (np.asarray(m.subj_id) % 2 == 1).astype(np.uint8) \
                if bs_split else None
            return native.sw_traceback_batch(
                q_list, s_list, np.asarray(subst_ext_fwd, dtype=np.int32),
                gap_first, gap_extend,
                subst_rev=(np.asarray(subst_ext_rev, dtype=np.int32)
                           if bs_split else None),
                use_rev=rev)

    pad = subst_ext_fwd.shape[0] - 1  # PAD rank
    qlen = (m.qry_end - m.qry_start).astype(np.int64)
    slen = (m.subj_end - m.subj_start).astype(np.int64)
    qb = np.array([_bucket(x) for x in qlen])
    sb = np.array([_bucket(x) for x in slen])
    # bisulfite: odd subject frames use the reverse matrix
    rev = (m.subj_id % 2 == 1) if bs_split else np.zeros(n, dtype=bool)

    group_keys = {}
    for i in range(n):
        group_keys.setdefault((int(qb[i]), int(sb[i]), bool(rev[i])), []).append(i)

    use_pallas = not with_trace and _use_pallas()
    if use_pallas:
        e8_fwd = sw_pallas.ext8_from_ext32(subst_ext_fwd)
        e8_rev = sw_pallas.ext8_from_ext32(subst_ext_rev)
        dev_fwd = dev_rev = None
    else:
        dev_fwd = jnp.asarray(subst_ext_fwd)
        dev_rev = jnp.asarray(subst_ext_rev)

    for (qbk, sbk, r), idxs in group_keys.items():
        B = len(idxs)
        qarr = np.full((B, qbk), pad, dtype=np.int32)
        sarr = np.full((B, sbk), pad, dtype=np.int32)
        for bi, i in enumerate(idxs):
            qf = q_frames[m.qry_id[i]]
            qarr[bi, : qlen[i]] = qf[m.qry_start[i] : m.qry_end[i]]
            sw = s_window.window(int(m.subj_id[i]), int(m.subj_start[i]),
                                 int(m.subj_end[i]))
            sarr[bi, : slen[i]] = sw
        if with_trace:
            mat = dev_rev if r else dev_fwd
            best, bi_, bj_, dirs = sw_xla.sw_align_batch(
                jnp.asarray(qarr), jnp.asarray(sarr), mat, gap_first, gap_extend)
            best, bi_, bj_ = map(np.asarray, (best, bi_, bj_))
            dirs = np.asarray(dirs)
            for bi2, i in enumerate(idxs):
                scores[i] = best[bi2]
                if best[bi2] > 0:
                    q0, s0, ops = sw_xla.traceback(
                        dirs, bi2, int(bi_[bi2]), int(bj_[bi2]))
                    traces[i] = (q0, s0, ops)
        elif use_pallas and qbk <= sw_pallas.M_MAX:
            scores[idxs] = sw_pallas.sw_score_pallas(
                qarr, sarr, e8_rev if r else e8_fwd, gap_first, gap_extend)
        elif native.get_lib() is not None:
            # host fallback for queries too long for the Pallas kernel's
            # VMEM budget (far faster than the XLA scan kernel)
            q_list = [q_frames[m.qry_id[i]][m.qry_start[i]:m.qry_end[i]]
                      for i in idxs]
            s_list = [s_window.window(int(m.subj_id[i]),
                                      int(m.subj_start[i]),
                                      int(m.subj_end[i])) for i in idxs]
            mat = np.asarray(subst_ext_rev if r else subst_ext_fwd,
                             dtype=np.int32)
            scores[idxs] = native.sw_score_batch(
                q_list, s_list, mat, gap_first, gap_extend)
        else:
            mat = jnp.asarray(subst_ext_rev if r else subst_ext_fwd)
            best, _, _ = sw_xla.sw_score_batch(
                jnp.asarray(qarr), jnp.asarray(sarr), mat, gap_first,
                gap_extend)
            scores[idxs] = np.asarray(best)
    return scores, traces


# ---------------------------------------------------------------------------
# Device-resident score pass: windows gathered on device from the resident
# query-frame/subject tensors; only match coordinates go host->device and
# only scores come back.
# ---------------------------------------------------------------------------

import functools


@functools.partial(jax.jit, static_argnames=("qbk", "sbk", "gap_first",
                                             "gap_extend"))
def _device_score_bucket(trans_q, trans_sbj, sbj_offsets,
                         qry_id, qry_start, qry_len, subj_id, subj_start,
                         subj_len, subst_ext8, qbk, sbk, gap_first,
                         gap_extend):
    from ..ops import sw_pallas

    pad = subst_ext8.shape[0] - 1
    B = qry_id.shape[0]
    iq = jnp.arange(qbk, dtype=jnp.int32)
    qidx = qry_start[:, None] + iq[None, :]
    qwin = trans_q[jnp.clip(qry_id, 0, trans_q.shape[0] - 1)[:, None],
                   jnp.clip(qidx, 0, trans_q.shape[1] - 1)]
    qwin = jnp.where(iq[None, :] < qry_len[:, None], qwin, pad)

    js = jnp.arange(sbk, dtype=jnp.int32)
    sabs = sbj_offsets[jnp.clip(subj_id, 0, sbj_offsets.shape[0] - 1)][:, None] \
        + subj_start[:, None] + js[None, :]
    swin = trans_sbj[jnp.clip(sabs, 0, trans_sbj.shape[0] - 1)].astype(jnp.int32)
    swin = jnp.where(js[None, :] < subj_len[:, None], swin, pad)

    return sw_pallas.sw_score_device(qwin.astype(jnp.int32), swin,
                                     subst_ext8, gap_first, gap_extend)


def sw_scores_device(m: MatchBatch, d_trans_q, d_trans_sbj, d_sbj_offsets,
                     e8_fwd, e8_rev, gap_first, gap_extend,
                     bs_split: bool) -> np.ndarray | None:
    """Pass-1 scores with device-side window gathering.  Matches are
    bucketed by padded shape class like the host path; each bucket is one
    fused dispatch (gather -> substitution image -> Pallas DP)."""
    from ..ops import sw_pallas

    n = len(m)
    scores = np.zeros(n, dtype=np.int64)
    if n == 0:
        return scores
    qlen = (m.qry_end - m.qry_start).astype(np.int64)
    slen = (m.subj_end - m.subj_start).astype(np.int64)
    if qlen.max() > sw_pallas.M_MAX:
        return None   # caller falls back to the bucketed host path
    rev = (m.subj_id % 2 == 1) if bs_split else np.zeros(n, dtype=bool)
    group_keys: dict = {}
    for i in range(n):
        group_keys.setdefault(
            (_bucket(int(qlen[i])), _bucket(int(slen[i])), bool(rev[i])),
            []).append(i)
    for (qbk, sbk, r), idxs in group_keys.items():
        idxs = np.asarray(idxs)
        BT = sw_pallas.batch_tile(max(sw_pallas._ceil(qbk, 128), 128))
        Bp = sw_pallas._ceil(len(idxs), BT)
        sbkp = sw_pallas._ceil(
            sbk, sw_pallas._chunk_cols(max(sw_pallas._ceil(qbk, 128), 128),
                                       BT))

        def pad_i32(a, fill=0):
            out = np.full(Bp, fill, dtype=np.int32)
            out[:len(idxs)] = a[idxs]
            return jnp.asarray(out)

        out = _device_score_bucket(
            d_trans_q, d_trans_sbj, d_sbj_offsets,
            pad_i32(m.qry_id), pad_i32(m.qry_start), pad_i32(qlen),
            pad_i32(m.subj_id), pad_i32(m.subj_start),
            pad_i32(slen, fill=-1),
            jnp.asarray(e8_rev if r else e8_fwd),
            max(sw_pallas._ceil(qbk, 128), 128), sbkp,
            int(gap_first), int(gap_extend))
        scores[idxs] = np.asarray(out)[:len(idxs)]
    return scores
