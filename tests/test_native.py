"""Native C++ helper tests: SW traceback parity with the device/XLA path,
and BGZF block format validation."""

import gzip
import struct

import numpy as np
import pytest

from lambda_tpu import native
from lambda_tpu.ops import sw_xla


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_native_traceback_matches_xla():
    import jax.numpy as jnp

    A = 6
    rng = np.random.default_rng(11)
    subst = rng.integers(-3, 4, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, 5)
    ext = sw_xla.extend_matrix(subst)

    B = 12
    q_list = [rng.integers(0, A, size=rng.integers(5, 40)).astype(np.int32)
              for _ in range(B)]
    s_list = [rng.integers(0, A, size=rng.integers(5, 50)).astype(np.int32)
              for _ in range(B)]

    scores, traces = native.sw_traceback_batch(q_list, s_list, ext, -7, -2)

    # XLA path, one by one (bucket-free comparison)
    for b in range(B):
        qp = np.full((1, 64), A, dtype=np.int32)
        sp = np.full((1, 64), A, dtype=np.int32)
        qp[0, :len(q_list[b])] = q_list[b]
        sp[0, :len(s_list[b])] = s_list[b]
        best, bi, bj, dirs = sw_xla.sw_align_batch(
            jnp.asarray(qp), jnp.asarray(sp), jnp.asarray(ext), -7, -2)
        best = int(np.asarray(best)[0])
        assert scores[b] == best
        if best <= 0:
            assert traces[b] is None
            continue
        q0, s0, ops = sw_xla.traceback(
            np.asarray(dirs), 0, int(np.asarray(bi)[0]),
            int(np.asarray(bj)[0]))
        assert traces[b] == (q0, s0, ops)
        # score recomputed from ops must equal reported score
        got = sw_xla.score_of_ops(q_list[b], s_list[b], *traces[b],
                                  subst, -7, -2)
        assert got == best


@needs_native
def test_native_bgzf_block():
    data = b"The quick brown fox jumps over the lazy dog" * 100
    blk = native.bgzf_compress_block(data)
    assert blk is not None
    # gzip-decodable
    assert gzip.decompress(blk) == data
    # BSIZE extra field = total size - 1 (SAM spec 4.1)
    assert blk[:4] == b"\x1f\x8b\x08\x04"
    xlen = struct.unpack("<H", blk[10:12])[0]
    assert xlen == 6 and blk[12:14] == b"BC"
    bsize = struct.unpack("<H", blk[16:18])[0]
    assert bsize == len(blk) - 1


def test_python_bgzf_block_fallback(tmp_path, monkeypatch):
    """The pure-Python bgzf fallback must emit spec-conformant blocks."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    from lambda_tpu.output import sam_bam

    class FH:
        def __init__(self):
            self.data = b""
        def write(self, b):
            self.data += b
        def close(self):
            pass

    w = sam_bam.SamBamWriter.__new__(sam_bam.SamBamWriter)
    w.fh = FH()
    chunk = b"payload" * 500
    w._bgzf_flush_block(chunk)
    blk = w.fh.data
    assert gzip.decompress(blk) == chunk
    bsize = struct.unpack("<H", blk[16:18])[0]
    assert bsize == len(blk) - 1


@needs_native
def test_merge_passes_matches_python():
    from lambda_tpu.search import extend

    rng = np.random.default_rng(5)
    n = 400
    qid = np.sort(rng.integers(0, 6, size=n)).astype(np.int64)
    sid = rng.integers(0, 8, size=n).astype(np.int64)
    qs = np.zeros(n, dtype=np.int64)
    qe = np.full(n, 50, dtype=np.int64)
    ss = rng.integers(0, 300, size=n).astype(np.int64)
    se = ss + rng.integers(10, 80, size=n)
    dlo = ss - rng.integers(0, 9, size=n)
    dhi = ss + rng.integers(0, 9, size=n)
    order = np.lexsort((se, ss, qe, qs, sid, qid))
    arrs = [a[order].copy() for a in (qid, sid, qs, qe, ss, se, dlo, dhi)]

    # python reference passes (incl. band unions)
    p = [a.copy() for a in arrs]
    pq, psid, pqs, pqe, pss, pse, plo, phi = p
    for i in range(n - 1):
        if pq[i] == pq[i+1] and psid[i] == psid[i+1] and pse[i] >= pss[i+1]:
            pse[i] = pse[i+1]
            pss[i+1] = pss[i]
            plo[i] = plo[i+1] = min(plo[i], plo[i+1])
            phi[i] = phi[i+1] = max(phi[i], phi[i+1])
    for i in range(n - 2, -1, -1):
        if pq[i] == pq[i+1] and psid[i] == psid[i+1] and pss[i+1] < pse[i]:
            pqs[i], pqe[i] = pqs[i+1], pqe[i+1]
            pss[i], pse[i] = pss[i+1], pse[i+1]
            plo[i] = min(plo[i], plo[i+1])
            phi[i] = max(phi[i], phi[i+1])
    rows = np.stack(p[:6], axis=1)
    pkeep = np.ones(n, dtype=bool)
    pkeep[1:] = (rows[1:] != rows[:-1]).any(axis=1)

    nkeep = native.merge_passes(*arrs)
    np.testing.assert_array_equal(nkeep, pkeep)
    for a, b in zip(arrs, p):
        np.testing.assert_array_equal(a, b)


@needs_native
def test_native_score_batch_matches_reference():
    A = 8
    rng = np.random.default_rng(3)
    subst = rng.integers(-3, 4, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, 6)
    q_list = [rng.integers(0, A, size=rng.integers(3, 60)).astype(np.int32)
              for _ in range(25)]
    s_list = [rng.integers(0, A, size=rng.integers(3, 70)).astype(np.int32)
              for _ in range(25)]
    got = native.sw_score_batch(q_list, s_list, subst, -9, -2)
    want = [sw_xla.sw_reference(q, s, subst, -9, -2)
            for q, s in zip(q_list, s_list)]
    np.testing.assert_array_equal(got, want)


@needs_native
def test_native_score_xdrop_matches_scalar_reference():
    """The native score kernel's chunk-granular X-drop must equal
    sw_band_xdrop_reference (the pinned LAMBDA_SW_XDROP semantics of the
    Pallas lane kernel) — including the trough-restart case where it
    differs from exact DP — so CPU and TPU backends score pass 1
    identically with X-drop enabled."""
    from lambda_tpu.ops import sw_band

    A = 4
    subst = np.full((A, A), -10, dtype=np.int32)
    np.fill_diagonal(subst, 5)
    # the trough-restart shape from tests/test_ops._xdrop_setup:
    # 20 matches, 40-mismatch trough, 30 matches; banded D=0
    q = np.zeros(90, dtype=np.int32)
    s = np.zeros(90, dtype=np.int32)
    q[20:60] = 1
    s[20:60] = 2
    q[60:90] = s[60:90] = 3
    got = native.sw_score_batch(
        [q], [s], subst, -12, -1, band=np.array([0], np.int32),
        nc=np.array([16], np.int32), x_drop=16)
    want = sw_band.sw_band_xdrop_reference(q, s, 0, subst, -12, -1,
                                           x_drop=16, nc=16)
    assert int(got[0]) == want == 100
    # large X: exact (same shape, no early exit)
    got2 = native.sw_score_batch(
        [q], [s], subst, -12, -1, band=np.array([0], np.int32),
        nc=np.array([16], np.int32), x_drop=10000)
    assert int(got2[0]) == 150
    # random pairs, assorted bands/chunks: full agreement
    rng = np.random.default_rng(9)
    q_list = [rng.integers(0, A, size=rng.integers(20, 70)).astype(np.int32)
              for _ in range(12)]
    s_list = [rng.integers(0, A, size=rng.integers(20, 80)).astype(np.int32)
              for _ in range(12)]
    bands = rng.integers(0, 14, size=12).astype(np.int32)
    ncs = rng.choice([8, 16, 32], size=12).astype(np.int32)
    got3 = native.sw_score_batch(q_list, s_list, subst, -12, -1,
                                 band=bands, nc=ncs, x_drop=7)
    want3 = [sw_band.sw_band_xdrop_reference(
        qq, ss, int(b), subst, -12, -1, x_drop=7, nc=int(c))
        for qq, ss, b, c in zip(q_list, s_list, bands, ncs)]
    np.testing.assert_array_equal(got3, want3)


@needs_native
def test_banded_run_bucketed_backends_agree(monkeypatch):
    """_run_bucketed's banded score pass: native and XLA backends match
    the exact banded reference on virtual windows (incl. a window poking
    left of the subject)."""
    from lambda_tpu.ops import sw_band
    from lambda_tpu.search import extend

    rng = np.random.default_rng(4)
    A = 6
    subst = rng.integers(-3, 4, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, 5)
    ext = sw_xla.extend_matrix(subst)
    q_frames = [rng.integers(0, A, size=60).astype(np.int32),
                rng.integers(0, A, size=40).astype(np.int32)]
    s_concat = rng.integers(0, A, size=200).astype(np.int32)
    s_concat[80:140] = q_frames[0]
    s_concat[0:38] = q_frames[1][2:]       # match at subject start
    sw = extend.SubjectWindows(s_concat, np.array([0, 200]))
    m = extend.MatchBatch(
        qry_id=np.array([0, 1]), subj_id=np.array([0, 0]),
        qry_start=np.array([0, 0]), qry_end=np.array([60, 40]),
        subj_start=np.array([60, 0]), subj_end=np.array([160, 50]),
        d_lo=np.array([12, -4]), d_hi=np.array([28, 3]))
    want = []
    for i in range(2):
        qf = q_frames[i]
        D = int(m.d_hi[i] - m.d_lo[i])
        win = sw.window_virtual(0, int(m.d_lo[i]), len(qf) + D, A)
        # ext includes the PAD row/col, needed for the virtual pads
        want.append(sw_band.sw_band_reference(qf, win, D, ext, -7, -2))

    for kern in ("native", "xla"):
        monkeypatch.setenv("LAMBDA_SW_KERNEL", kern)
        scores, _ = extend._run_bucketed(m, q_frames, sw, ext, ext, -7, -2,
                                         False, with_trace=False)
        assert list(scores) == want, (kern, list(scores), want)
    # traceback pass agrees on scores too
    scores2, traces = extend._run_bucketed(m, q_frames, sw, ext, ext, -7, -2,
                                           False, with_trace=True)
    assert list(scores2) == want
    assert traces[0] is not None and traces[1] is not None


@needs_native
@pytest.mark.parametrize("bs_mode", [False, True])
def test_native_traceback_stats_matches_python(bs_mode):
    """sw_traceback_stats_batch's inline stats == the pure-Python
    records.compute_alignment_stats walk over the same traces."""
    from lambda_tpu.search import records

    A = 6
    rng = np.random.default_rng(23)
    subst = rng.integers(-3, 4, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, 5)
    if bs_mode:
        # asymmetric bisulfite-like extra match: score(3,1) == score(3,3)
        subst[3, 1] = subst[3, 3]
    ext = sw_xla.extend_matrix(subst)

    B = 16
    q_list = [rng.integers(0, A, size=rng.integers(8, 48)).astype(np.int32)
              for _ in range(B)]
    s_list = []
    for q in q_list:
        s = rng.integers(0, A, size=len(q) + 10).astype(np.int32)
        off = rng.integers(0, 8)
        s[off:off + len(q)] = q           # plant homology
        for _ in range(4):                # mutations
            s[rng.integers(0, len(s))] = rng.integers(0, A)
        s_list.append(s)
    band = np.full(B, 10, dtype=np.int32)

    sc, traces, q0, s0, st = native.sw_traceback_stats_batch(
        q_list, s_list, ext, -7, -2, band=band, bs_mode=bs_mode)
    sc2, traces2 = native.sw_traceback_batch(q_list, s_list, ext, -7, -2,
                                             band=band)
    np.testing.assert_array_equal(sc, sc2)
    for b in range(B):
        assert traces[b] == traces2[b]
        if traces[b] is None:
            assert (st[b] == 0).all()
            continue
        tq0, ts0, ops = traces[b]
        bm = records.BlastMatch(
            n_q_id=0, n_s_id=0, q_frame_shift=0, s_frame_shift=0,
            q_length=len(q_list[b]), s_length=len(s_list[b]),
            q_start=tq0, q_end=0, s_start=ts0, s_end=0,
            raw_score=int(sc[b]), ops=ops)
        records.compute_alignment_stats(bm, q_list[b], s_list[b], subst,
                                        bs_mode)
        want = [bm.align_length, bm.num_matches, bm.num_mismatches,
                bm.num_positives, bm.num_gap_opens, bm.num_gaps,
                bm.num_insertions, bm.num_deletions]
        assert list(st[b]) == want, (b, list(st[b]), want)


def test_take_rows_and_frame_of_pos():
    """Parallel index-build gathers == numpy fancy indexing: keys[order]
    row gather and the fused frame_of_pos[order] lookup (binary search
    per row instead of materializing np.repeat)."""
    from lambda_tpu import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    P, words = 5000, 4
    src = rng.integers(0, 2**32, size=(P, words), dtype=np.uint32)
    order = rng.permutation(P).astype(np.int64)
    got = native.take_rows_u32(src, order)
    assert (got == src[order]).all()

    # subset order (not a full permutation): shape and values follow
    # numpy src[order] semantics (regression: loop once ran to src rows)
    sub_order = order[:17]
    got_sub = native.take_rows_u32(src, sub_order)
    assert got_sub.shape == (17, words)
    assert (got_sub == src[sub_order]).all()
    import pytest
    with pytest.raises(IndexError):
        native.take_rows_u32(src, np.array([0, P], dtype=np.int64))
    with pytest.raises(IndexError):
        native.take_rows_u32(src, np.array([-1], dtype=np.int64))

    # ragged frames incl. empty ones
    lens = rng.integers(0, 7, size=40).astype(np.int64)
    lens[0] = 0
    offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    Pf = int(offsets[-1])
    order2 = rng.permutation(Pf).astype(np.int64)
    frame_of_pos = np.repeat(
        np.arange(len(lens), dtype=np.int64), lens)
    want = frame_of_pos[order2].astype(np.uint32)
    got2 = native.take_frame_of_pos(offsets, order2)
    assert (got2 == want).all()
    with pytest.raises(IndexError):
        native.take_frame_of_pos(offsets, np.array([Pf], dtype=np.int64))


def test_alignment_stats_unmerged_runs_and_bounds():
    """compute_alignment_stats follows the reference's column walk:
    consecutive unmerged runs of the same gap op count ONE open (1 open
    + extensions), and an M-run past the frame end raises instead of
    numpy-clamping into silently wrong pident."""
    from lambda_tpu.search import records

    subst = np.full((4, 4), -3, dtype=np.int32)
    np.fill_diagonal(subst, 5)
    q = np.array([0, 1, 2, 3], dtype=np.uint8)
    s = np.array([0, 1, 1, 2, 3, 0], dtype=np.uint8)

    def mk(ops):
        return records.BlastMatch(
            n_q_id=0, n_s_id=0, q_frame_shift=0, s_frame_shift=0,
            q_length=4, s_length=6, q_start=0, q_end=0, s_start=0,
            s_end=0, raw_score=0, ops=ops)

    bm = mk([("M", 2), ("D", 1), ("D", 1), ("M", 2)])
    records.compute_alignment_stats(bm, q, s, subst, False)
    assert bm.num_gap_opens == 1          # ref column walk: 1 open + 1 ext
    assert bm.num_gaps == 2
    assert bm.align_length == 6

    bad = mk([("M", 5)])
    import pytest
    with pytest.raises(IndexError, match="overrun"):
        records.compute_alignment_stats(bad, np.zeros(3, np.uint8),
                                        np.zeros(9, np.uint8), subst, False)
