"""ctypes loader for the native C++ runtime helpers (native/lambda_native.cpp).

The reference's runtime is C++ throughout; this module provides the
host-side native pieces of the TPU framework: the SW traceback pass over
extension survivors and BGZF block compression for BAM output.  The
library is compiled on first use with g++ (cached under
``~/.cache/lambda_tpu``); every entry point has a pure-Python fallback at
its call site, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "lambda_native.cpp"
_lib = None
_tried = False


def _isa_tag() -> str:
    """Cache key component for -march=native builds: shared cache dirs
    (NFS homes) must not serve ISA-incompatible binaries."""
    import platform

    key = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    key += line
                    break
    except OSError:
        pass
    return hashlib.sha256(key.encode()).hexdigest()[:8]


def _build() -> Path | None:
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    try:
        cache = Path(os.environ.get("LAMBDA_NATIVE_CACHE",
                                    Path.home() / ".cache" / "lambda_tpu"))
        cache.mkdir(parents=True, exist_ok=True)
    except (OSError, RuntimeError):
        return None
    so = cache / f"liblambda_native-{tag}-{_isa_tag()}.so"
    if so.exists():
        return so
    # per-PID temp: concurrent cold-cache builders must not interleave
    tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-march=native",
           str(_SRC), "-o", str(tmp), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return so


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LAMBDA_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.sw_traceback_batch.argtypes = [
        i32p, ctypes.c_int32, i32p,          # q, q_stride, qlen
        i32p, ctypes.c_int32, i32p,          # s, s_stride, slen
        ctypes.c_int32,                      # B
        i32p, ctypes.c_int32,                # subst, alph
        i32p, u8p,                           # subst_rev, use_rev
        i32p,                                # band (per-row D; NULL=full)
        ctypes.c_int32, ctypes.c_int32,      # gap_first, gap_extend
        i32p, i32p, i32p, i32p, i32p,        # score, q0, s0, qe, se
        u8p, ctypes.c_int32, i32p,           # ops, ops_stride, ops_len
    ]
    lib.sw_traceback_batch.restype = None
    lib.sw_traceback_stats_batch.argtypes = [
        i32p, ctypes.c_int32, i32p,          # q, q_stride, qlen
        i32p, ctypes.c_int32, i32p,          # s, s_stride, slen
        ctypes.c_int32,                      # B
        i32p, ctypes.c_int32,                # subst, alph
        i32p, u8p,                           # subst_rev, use_rev
        i32p,                                # band
        ctypes.c_int32, ctypes.c_int32,      # gap_first, gap_extend
        ctypes.c_int32,                      # bs_mode
        i32p, i32p, i32p, i32p, i32p,        # score, q0, s0, qe, se
        u8p, ctypes.c_int32, i32p,           # ops, ops_stride, ops_len
        i32p,                                # stats (B, 8)
    ]
    lib.sw_traceback_stats_batch.restype = None
    lib.sw_score_batch_host.argtypes = [
        i32p, ctypes.c_int32, i32p,
        i32p, ctypes.c_int32, i32p,
        ctypes.c_int32, i32p, ctypes.c_int32,
        i32p, u8p, i32p, ctypes.c_int32, ctypes.c_int32,
        i32p, ctypes.c_int32,               # nc (per-row), x_drop
        i32p,
    ]
    lib.sw_score_batch_host.restype = None
    lib.bgzf_compress_block.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                        u8p, ctypes.c_int32]
    lib.bgzf_compress_block.restype = ctypes.c_int32
    lib.gzip_compress_parallel.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        u8p, ctypes.c_int64]
    lib.gzip_compress_parallel.restype = ctypes.c_int64
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.merge_passes.argtypes = [i64p] * 8 + [u8p, ctypes.c_int64]
    lib.merge_passes.restype = None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.sort_rows_u32.argtypes = [u32p, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.sort_rows_u32.restype = None
    lib.take_rows_u32.argtypes = [u32p, ctypes.c_int64, ctypes.c_int32,
                                  i64p, u32p]
    lib.take_rows_u32.restype = None
    lib.take_frame_of_pos.argtypes = [i64p, ctypes.c_int64, i64p,
                                      ctypes.c_int64, u32p]
    lib.take_frame_of_pos.restype = None
    lib.pack_position_keys.argtypes = [u8p, ctypes.c_int64, i64p,
                                       ctypes.c_int64, ctypes.c_int32,
                                       ctypes.c_int32, u32p]
    lib.pack_position_keys.restype = None
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def _marshal_sw_batch(q_list, s_list, subst, subst_rev, use_rev):
    """Pack ragged rank sequences + matrices into the contiguous arrays
    the batched SW entry points take."""
    B = len(q_list)
    qs = max((len(x) for x in q_list), default=1) or 1
    ss = max((len(x) for x in s_list), default=1) or 1
    q = np.zeros((B, qs), dtype=np.int32)
    s = np.zeros((B, ss), dtype=np.int32)
    qlen = np.zeros(B, dtype=np.int32)
    slen = np.zeros(B, dtype=np.int32)
    for i, (qq, sq) in enumerate(zip(q_list, s_list)):
        q[i, :len(qq)] = qq
        s[i, :len(sq)] = sq
        qlen[i] = len(qq)
        slen[i] = len(sq)
    sub = np.ascontiguousarray(subst, dtype=np.int32)
    sub_rev = (np.ascontiguousarray(subst_rev, dtype=np.int32)
               if subst_rev is not None else None)
    urev = (np.ascontiguousarray(use_rev, dtype=np.uint8)
            if use_rev is not None else None)
    return q, s, qlen, slen, sub, sub_rev, urev


def _sw_traceback_call(q_list, s_list, subst, gap_first, gap_extend,
                       subst_rev, use_rev, band, bs_mode):
    """Shared marshaling + call + trace decoding for the two traceback
    entry points.  ``bs_mode=None`` calls sw_traceback_batch; otherwise
    sw_traceback_stats_batch with a (B, 8) stats output.  Returns
    (scores, traces, q0, s0, stats-or-None)."""
    lib = get_lib()
    assert lib is not None
    B = len(q_list)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    q, s, qlen, slen, sub, sub_rev, urev = _marshal_sw_batch(
        q_list, s_list, subst, subst_rev, use_rev)
    band = (np.ascontiguousarray(band, dtype=np.int32)
            if band is not None else None)
    qs = q.shape[1]
    ss = s.shape[1]
    alph = sub.shape[0]

    score = np.zeros(B, dtype=np.int32)
    q0 = np.zeros(B, dtype=np.int32)
    s0 = np.zeros(B, dtype=np.int32)
    qe = np.zeros(B, dtype=np.int32)
    se = np.zeros(B, dtype=np.int32)
    ops_stride = qs + ss + 2
    ops = np.zeros((B, ops_stride), dtype=np.uint8)
    ops_len = np.zeros(B, dtype=np.int32)

    args = [
        _ptr(q, i32p), qs, _ptr(qlen, i32p),
        _ptr(s, i32p), ss, _ptr(slen, i32p),
        B, _ptr(sub, i32p), alph,
        _ptr(sub_rev, i32p) if sub_rev is not None else None,
        _ptr(urev, u8p) if urev is not None else None,
        _ptr(band, i32p) if band is not None else None,
        int(gap_first), int(gap_extend),
    ]
    outs = [
        _ptr(score, i32p), _ptr(q0, i32p), _ptr(s0, i32p),
        _ptr(qe, i32p), _ptr(se, i32p),
        _ptr(ops, u8p), ops_stride, _ptr(ops_len, i32p),
    ]
    if bs_mode is None:
        stats = None
        lib.sw_traceback_batch(*args, *outs)
    else:
        stats = np.zeros((B, 8), dtype=np.int32)
        lib.sw_traceback_stats_batch(*args, int(bool(bs_mode)), *outs,
                                     _ptr(stats, i32p))

    traces = []
    for b in range(B):
        if score[b] <= 0:
            traces.append(None)
            continue
        traces.append((int(q0[b]), int(s0[b]),
                       rle_ops(ops[b, :ops_len[b]])))
    return score.astype(np.int64), traces, q0, s0, stats


def sw_traceback_batch(q_list, s_list, subst: np.ndarray,
                       gap_first: int, gap_extend: int,
                       subst_rev: np.ndarray | None = None,
                       use_rev: np.ndarray | None = None,
                       band: np.ndarray | None = None):
    """Batched local SW with traceback on the host.

    q_list/s_list: sequences (1-D int arrays of ranks).  band: optional
    per-row diagonal band sizes (ops/sw_band.py semantics; None = full
    rectangle).  Returns (scores, traces) where traces[i] =
    (q0, s0, [(op, run), ...]) in the conventions of
    ops/sw_xla.traceback, or None for score-0 alignments.
    """
    score, traces, _, _, _ = _sw_traceback_call(
        q_list, s_list, subst, gap_first, gap_extend,
        subst_rev, use_rev, band, bs_mode=None)
    return score, traces


def rle_ops(raw: np.ndarray) -> list[tuple[str, int]]:
    """Run-length encode a 1-D uint8 op-byte array (vectorized)."""
    if len(raw) == 0:
        return []
    cut = np.flatnonzero(np.diff(raw)) + 1
    starts = np.concatenate(([0], cut))
    ends = np.concatenate((cut, [len(raw)]))
    return [(chr(raw[st]), int(en - st)) for st, en in zip(starts, ends)]


def sw_traceback_stats_batch(q_list, s_list, subst: np.ndarray,
                             gap_first: int, gap_extend: int,
                             subst_rev: np.ndarray | None = None,
                             use_rev: np.ndarray | None = None,
                             band: np.ndarray | None = None,
                             bs_mode: bool = False):
    """Batched local SW with traceback AND inline alignment statistics on
    the host (the compiled per-match tail; search_algo.hpp:1302-1325).

    Returns (scores, traces, q0, s0, stats) where stats is a (B, 8) int32
    array [align_length, matches, mismatches, positives, gap_opens, gaps,
    insertions, deletions] per match (records.compute_alignment_stats
    semantics) and traces follows sw_traceback_batch conventions."""
    return _sw_traceback_call(q_list, s_list, subst, gap_first, gap_extend,
                              subst_rev, use_rev, band,
                              bs_mode=bool(bs_mode))


def gzip_compress(data: bytes, level: int = 6,
                  chunk: int = 1 << 20) -> bytes | None:
    """One complete gzip member, chunks deflated in parallel (OpenMP;
    pigz-style independent chunks — the threaded-compression equivalent
    of the reference's bio::io transparent_ostream threads).  Output is
    deterministic for a fixed chunk size regardless of thread count.
    Returns None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    src = (np.frombuffer(data, dtype=np.uint8) if len(data)
           else np.zeros(1, dtype=np.uint8))
    out = np.zeros(len(data) + len(data) // 2 + 4096, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.gzip_compress_parallel(
        _ptr(src, u8p), len(data), chunk, level, _ptr(out, u8p), len(out))
    if n < 0:
        return None
    return out[:n].tobytes()


def bgzf_compress_block(data: bytes, level: int = 6) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(len(data) + 4096, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.bgzf_compress_block(_ptr(src, u8p), len(data), level,
                                _ptr(out, u8p), len(out))
    if n < 0:
        return None
    return out[:n].tobytes()


def merge_passes(qid, sid, qs, qe, ss, se, dlo, dhi):
    """In-place widen/merge passes over pre-sorted match rows (exact
    replication of search_algo.hpp:1148-1169), unioning the diagonal
    extension bands (dlo/dhi) of merged rows.  Arrays must be
    contiguous int64; returns the unique-keep mask."""
    lib = get_lib()
    assert lib is not None
    n = len(qid)
    keep = np.zeros(n, dtype=np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.merge_passes(*(a.ctypes.data_as(i64p)
                       for a in (qid, sid, qs, qe, ss, se, dlo, dhi)),
                     keep.ctypes.data_as(u8p), n)
    return keep.astype(bool)


def sort_rows_u32(keys: np.ndarray) -> np.ndarray | None:
    """Stable lexicographic argsort of (P, words<=4) uint32 key rows
    (parallel; np.lexsort equivalent).  Returns None without the lib."""
    lib = get_lib()
    if lib is None or keys.shape[1] > 4:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    P = keys.shape[0]
    order = np.zeros(P, dtype=np.int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sort_rows_u32(keys.ctypes.data_as(u32p), P, keys.shape[1],
                      order.ctypes.data_as(i64p))
    return order


def take_rows_u32(src: np.ndarray, order: np.ndarray) -> np.ndarray | None:
    """Parallel ``src[order]`` for (P, words) uint32 rows (the sorted
    key-array gather of the index build; the reference applies its sort
    on all threads: generateIndex passes options.threads, mkindex_algo.hpp:601-611).  Returns None without
    the lib (callers fall back to numpy fancy indexing).  Raises
    IndexError on out-of-range rows like the numpy fallback (negative
    indices are NOT supported)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint32)
    order = np.ascontiguousarray(order, dtype=np.int64)
    n, words = len(order), src.shape[1]
    if n and (order.min() < 0 or order.max() >= src.shape[0]):
        raise IndexError("take_rows_u32: order out of range")
    dst = np.empty((n, words), dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.take_rows_u32(src.ctypes.data_as(u32p), n, words,
                      order.ctypes.data_as(i64p),
                      dst.ctypes.data_as(u32p))
    return dst


def take_frame_of_pos(offsets: np.ndarray,
                      order: np.ndarray) -> np.ndarray | None:
    """Parallel ``frame_of_pos[order]`` without materializing the
    O(P) ``np.repeat`` expansion: per-row binary search over the frame
    offsets (fuses the reference's threaded frame-id fill,
    mkindex_algo.hpp:601-611 generateIndex(threads), with the sort-apply gather).  Returns
    None without the lib.  Raises IndexError on positions outside
    [offsets[0], offsets[-1]) like the numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    P = len(order)
    if P and (order.min() < offsets[0] or order.max() >= offsets[-1]):
        raise IndexError("take_frame_of_pos: position out of range")
    out = np.empty(P, dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.take_frame_of_pos(offsets.ctypes.data_as(i64p), len(offsets) - 1,
                          order.ctypes.data_as(i64p), P,
                          out.ctypes.data_as(u32p))
    return out


def pack_position_keys(concat: np.ndarray, offsets: np.ndarray,
                       bits: int, words: int) -> np.ndarray | None:
    """Parallel key packing for the k-mer index (build_position_keys
    equivalent).  Returns None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    concat = np.ascontiguousarray(concat, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    P = len(concat)
    keys = np.zeros((P, words), dtype=np.uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pack_position_keys(concat.ctypes.data_as(u8p), P,
                           offsets.ctypes.data_as(i64p), len(offsets) - 1,
                           bits, words, keys.ctypes.data_as(u32p))
    return keys


def sw_score_batch(q_list, s_list, subst: np.ndarray,
                   gap_first: int, gap_extend: int,
                   subst_rev: np.ndarray | None = None,
                   use_rev: np.ndarray | None = None,
                   band: np.ndarray | None = None,
                   nc: np.ndarray | None = None,
                   x_drop: int = 0) -> np.ndarray:
    """Batched score-only local SW on the host (pass-1 CPU fallback).
    band: optional per-row diagonal band sizes (None = full rectangle).
    nc/x_drop: chunk-granular X-drop early exit (LAMBDA_SW_XDROP
    semantics, sw_band.sw_band_xdrop_reference) with per-row column
    chunk sizes; x_drop=0 disables."""
    lib = get_lib()
    assert lib is not None
    B = len(q_list)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    q, s, qlen, slen, sub, sub_rev, urev = _marshal_sw_batch(
        q_list, s_list, subst, subst_rev, use_rev)
    band = (np.ascontiguousarray(band, dtype=np.int32)
            if band is not None else None)
    nc = (np.ascontiguousarray(nc, dtype=np.int32)
          if nc is not None else None)
    score = np.zeros(B, dtype=np.int32)
    lib.sw_score_batch_host(
        _ptr(q, i32p), q.shape[1], _ptr(qlen, i32p),
        _ptr(s, i32p), s.shape[1], _ptr(slen, i32p),
        B, _ptr(sub, i32p), sub.shape[0],
        _ptr(sub_rev, i32p) if sub_rev is not None else None,
        _ptr(urev, u8p) if urev is not None else None,
        _ptr(band, i32p) if band is not None else None,
        int(gap_first), int(gap_extend),
        _ptr(nc, i32p) if nc is not None else None, int(x_drop),
        _ptr(score, i32p))
    return score.astype(np.int64)
