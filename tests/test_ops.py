import numpy as np
import pytest

import jax.numpy as jnp

from lambda_tpu import frames as fr
from lambda_tpu.index import build as ib
from lambda_tpu.ops import kmer, searchsorted as ss, sw_xla


# ---------------------------------------------------------------------------
# searchsorted + kmer packing against the index
# ---------------------------------------------------------------------------


def _make_index(seed=0, alph=4, sizes=(60, 40, 80)):
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(0, alph, size=n).astype(np.uint8) for n in sizes]
    concat, offsets, _ = fr.concat_frames(seqs)
    return seqs, concat, offsets, ib.build_kmer_index(concat, offsets, alph)


def _brute_occurrences(seqs, offsets, pat):
    out = []
    for f, s in enumerate(seqs):
        for i in range(len(s) - len(pat) + 1):
            if (s[i : i + len(pat)] == pat).all():
                out.append(int(offsets[f]) + i)
    return out


def test_device_search_matches_bruteforce():
    seqs, concat, offsets, idx = _make_index()
    k = 8
    # take a handful of patterns that exist plus one that doesn't
    pats = [concat[5 : 5 + k], concat[70 : 70 + k], concat[130 : 130 + k],
            np.array([0] * k, dtype=np.uint8),
            np.array([3, 3, 0, 1, 2, 3, 0, 1], dtype=np.uint8)]
    chars = jnp.asarray(np.stack(pats).astype(np.int32))
    lengths = jnp.full((len(pats),), k, jnp.int32)
    cpw = idx.chars_per_word
    targets = kmer.pack_prefix(chars, lengths, idx.bits, cpw, idx.words)
    masks = ss.length_masks(lengths, idx.bits, cpw, idx.words)
    keys = jnp.asarray(idx.keys)
    n = len(idx.pos)
    lo, hi = ss.search_range(keys, targets, masks,
                             jnp.zeros(len(pats), jnp.int32),
                             jnp.full((len(pats),), n, jnp.int32),
                             ss.steps_for(n))
    lo, hi = np.asarray(lo), np.asarray(hi)
    for p in range(len(pats)):
        expect = sorted(_brute_occurrences(seqs, offsets, pats[p]))
        got = sorted(int(idx.pos[i]) for i in range(lo[p], hi[p]))
        assert got == expect, f"pattern {p}"


def test_search_range_bucketed_equals_unbucketed():
    """The prefix bucket table is purely an accelerator: (lo, hi) must
    equal the unbucketed search for every target — including targets
    whose mask is SHORTER than the bucketed prefix (usable=False) and
    indexes padded with 0xFFFFFFFF rows (sharded stacking)."""
    rng = np.random.default_rng(11)
    for trial, pad_rows in ((0, 0), (1, 13)):
        seqs, concat, offsets, idx = _make_index(seed=20 + trial,
                                                 sizes=(300, 200, 150))
        keys_np = idx.keys
        if pad_rows:
            keys_np = np.concatenate(
                [keys_np, np.full((pad_rows, idx.words), 0xFFFFFFFF,
                                  dtype=np.uint32)])
        n = len(keys_np)
        m = ss.pick_bucket_m(idx.bits, idx.chars_per_word, n)
        assert m >= 1
        table = jnp.asarray(ss.prefix_table(keys_np[:, 0], idx.bits, m))
        bshift = 32 - idx.bits * m

        # mixed prefix lengths: shorter than m (bucket unusable), == m,
        # longer than m, and full capacity; existing + random targets
        lens, rows = [], []
        for L in (max(1, m - 1), m, m + 3, min(idx.capacity, 12)):
            for _ in range(8):
                if rng.random() < 0.6 and idx.num_positions:
                    r = int(rng.integers(0, idx.num_positions))
                    chars = np.zeros(idx.capacity, np.int32)
                    p = int(idx.pos[r])
                    w = concat[p : p + L]
                    chars[: len(w)] = w
                else:
                    chars = rng.integers(
                        0, idx.alphabet_size, idx.capacity).astype(np.int32)
                lens.append(L)
                rows.append(chars)
        chars = jnp.asarray(np.stack(rows))
        lengths = jnp.asarray(np.array(lens, np.int32))
        targets = kmer.pack_prefix(chars, lengths, idx.bits,
                                   idx.chars_per_word, idx.words)
        masks = ss.length_masks(lengths, idx.bits, idx.chars_per_word,
                                idx.words)
        keys = jnp.asarray(keys_np)
        lo0 = jnp.zeros(len(lens), jnp.int32)
        hi0 = jnp.full(len(lens), n, jnp.int32)
        steps = ss.steps_for(n)
        ref = ss.search_range(keys, targets, masks, lo0, hi0, steps)
        got = ss.search_range(keys, targets, masks, lo0, hi0, steps,
                              table, bshift)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_pack_prefix_matches_index_keys():
    seqs, concat, offsets, idx = _make_index(seed=3)
    # key of position p with full capacity must equal index-built key
    cap = idx.capacity
    p = 7
    window = np.zeros(cap, dtype=np.int32)
    ln = min(int(offsets[1]) - p, cap)
    window[:ln] = concat[p : p + ln]
    t = kmer.pack_prefix(jnp.asarray(window[None, :]),
                         jnp.asarray([ln], dtype=jnp.int32),
                         idx.bits, idx.chars_per_word, idx.words)
    row = np.where(idx.pos == p)[0][0]
    assert (np.asarray(t)[0] == idx.keys[row]).all()


def test_append_char_equals_longer_prefix():
    bits, cpw, words = 4, 8, 4
    chars = jnp.asarray([[1, 2, 3, 0, 1, 2, 3, 0, 1, 2]], dtype=jnp.int32)
    t9 = kmer.pack_prefix(chars, jnp.asarray([9]), bits, cpw, words)
    t10 = kmer.pack_prefix(chars, jnp.asarray([10]), bits, cpw, words)
    t9e = kmer.append_char(t9, jnp.asarray([9]), chars[:, 9], bits, cpw, words)
    assert (np.asarray(t9e) == np.asarray(t10)).all()


def test_variant_table_half_exact():
    pos, rep = kmer.variant_table(k=8, delta=1, alphabet_size=4, half_exact=True)
    # identity + positions 4..7 x 4 letters
    assert len(pos) == 1 + 4 * 4
    assert pos[0] == -1
    assert set(pos[1:]) == {4, 5, 6, 7}
    seeds = jnp.asarray([[0, 1, 2, 3, 0, 1, 2, 3]], dtype=jnp.int32)
    variants, valid = kmer.make_variants(seeds, pos, rep)
    assert variants.shape == (1, 17, 8)
    v = np.asarray(valid)[0]
    # 4 variants (one per position) collide with the original char
    assert v[0] and v.sum() == 17 - 4
    # every valid non-identity variant differs in exactly one 2nd-half pos
    vr = np.asarray(variants)[0]
    sd = np.asarray(seeds)[0]
    for i in range(1, 17):
        diff = (vr[i] != sd).nonzero()[0]
        if v[i]:
            assert len(diff) == 1 and diff[0] >= 4
        else:
            assert len(diff) == 0


def test_variant_delta0_and_unsupported():
    pos, rep = kmer.variant_table(5, 0, 4, True)
    assert list(pos) == [-1]
    # delta >= 2 is served by pigeonhole seeding, not enumeration
    with pytest.raises(ValueError):
        kmer.variant_table(5, 2, 4, True)


# ---------------------------------------------------------------------------
# Smith-Waterman
# ---------------------------------------------------------------------------


def _random_case(rng, alph, M, N):
    subst = rng.integers(-3, 3, size=(alph, alph)).astype(np.int32)
    # make diagonal favorable so local alignments exist
    np.fill_diagonal(subst, rng.integers(2, 6, size=alph))
    q = rng.integers(0, alph, size=M).astype(np.int32)
    s = rng.integers(0, alph, size=N).astype(np.int32)
    return q, s, subst


def test_sw_score_matches_reference_random():
    rng = np.random.default_rng(42)
    alph = 5
    cases = [_random_case(rng, alph, rng.integers(5, 40), rng.integers(5, 50))
             for _ in range(12)]
    gf, ge = -7, -2
    Mmax = max(len(q) for q, _, _ in cases)
    Nmax = max(len(s) for _, s, _ in cases)
    subst = cases[0][2]
    ext = sw_xla.extend_matrix(subst)
    qb = np.full((len(cases), Mmax), alph, dtype=np.int32)
    sb = np.full((len(cases), Nmax), alph, dtype=np.int32)
    for i, (q, s, _) in enumerate(cases):
        qb[i, : len(q)] = q
        sb[i, : len(s)] = s
    best, bi, bj = sw_xla.sw_score_batch(
        jnp.asarray(qb), jnp.asarray(sb), jnp.asarray(ext), gf, ge)
    best = np.asarray(best)
    for i, (q, s, _) in enumerate(cases):
        expect = sw_xla.sw_reference(q, s, subst, gf, ge)
        assert best[i] == expect, f"case {i}"


def test_sw_align_traceback_score_consistent():
    rng = np.random.default_rng(7)
    alph = 4
    gf, ge = -5, -2
    B, M, N = 6, 24, 30
    subst = rng.integers(-4, 2, size=(alph, alph)).astype(np.int32)
    np.fill_diagonal(subst, 3)
    ext = sw_xla.extend_matrix(subst)
    qb = rng.integers(0, alph, size=(B, M)).astype(np.int32)
    sb = rng.integers(0, alph, size=(B, N)).astype(np.int32)
    best, bi, bj, dirs = sw_xla.sw_align_batch(
        jnp.asarray(qb), jnp.asarray(sb), jnp.asarray(ext), gf, ge)
    best, bi, bj = map(np.asarray, (best, bi, bj))
    dirs = np.asarray(dirs)
    for b in range(B):
        if best[b] == 0:
            continue
        q0, s0, ops = sw_xla.traceback(dirs, b, int(bi[b]), int(bj[b]))
        score = sw_xla.score_of_ops(qb[b], sb[b], q0, s0, ops, subst, gf, ge)
        assert score == best[b], f"alignment {b}: {ops}"
        # end coordinates consistent with consumed ops
        qlen = sum(r for op, r in ops if op in ("M", "I"))
        slen = sum(r for op, r in ops if op in ("M", "D"))
        assert q0 + qlen == bi[b] and s0 + slen == bj[b]
        # reference score equality
        assert best[b] == sw_xla.sw_reference(qb[b], sb[b], subst, gf, ge)


def test_sw_known_alignment():
    # identical sequences: perfect diagonal
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int32)
    subst = np.full((4, 4), -3, dtype=np.int32)
    np.fill_diagonal(subst, 2)
    ext = sw_xla.extend_matrix(subst)
    best, bi, bj, dirs = sw_xla.sw_align_batch(
        jnp.asarray(q[None]), jnp.asarray(q[None]), jnp.asarray(ext), -7, -2)
    assert int(best[0]) == 16
    q0, s0, ops = sw_xla.traceback(np.asarray(dirs), 0, int(bi[0]), int(bj[0]))
    assert (q0, s0) == (0, 0)
    assert ops == [("M", 8)]


def test_sw_gap_alignment():
    # q = ACGTACGT, s = ACGTTTACGT -> expect a 2-base gap in query (D ops)
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int32)
    s = np.array([0, 1, 2, 3, 3, 3, 0, 1, 2, 3], dtype=np.int32)
    subst = np.full((4, 4), -3, dtype=np.int32)
    np.fill_diagonal(subst, 2)
    ext = sw_xla.extend_matrix(subst)
    gf, ge = -4, -1
    best, bi, bj, dirs = sw_xla.sw_align_batch(
        jnp.asarray(q[None]), jnp.asarray(s[None]), jnp.asarray(ext), gf, ge)
    # 8 matches (16) - gap of 2 (4+1) = 11
    assert int(best[0]) == 11
    q0, s0, ops = sw_xla.traceback(np.asarray(dirs), 0, int(bi[0]), int(bj[0]))
    assert sum(r for op, r in ops if op == "D") == 2
    assert sw_xla.score_of_ops(q, s, q0, s0, ops, subst, gf, ge) == 11


# ---------------------------------------------------------------------------
# Pallas SW score kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------


def test_sw_pallas_matches_reference():
    from lambda_tpu.ops import sw_pallas

    A = 27
    rng = np.random.default_rng(7)
    subst = rng.integers(-4, 6, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, rng.integers(4, 12, size=A))
    e8 = sw_pallas.extend_matrix8(subst)

    B, M, N = 5, 33, 47
    q = rng.integers(0, A, size=(B, M)).astype(np.int32)
    s = rng.integers(0, A, size=(B, N)).astype(np.int32)
    qlen = rng.integers(4, M + 1, size=B)
    slen = rng.integers(4, N + 1, size=B)
    for b in range(B):
        q[b, qlen[b]:] = A
        s[b, slen[b]:] = A

    got = sw_pallas.sw_score_pallas(q, s, e8, -12, -1, interpret=True)
    want = np.array([
        sw_xla.sw_reference(q[b, :qlen[b]], s[b, :slen[b]], subst, -12, -1)
        for b in range(B)])
    np.testing.assert_array_equal(got, want)


def test_sw_pallas_ext8_roundtrip():
    from lambda_tpu.ops import sw_pallas

    A = 5
    subst = np.arange(A * A).reshape(A, A).astype(np.int32) - 12
    ext32 = sw_xla.extend_matrix(subst)
    e8 = sw_pallas.ext8_from_ext32(ext32)
    assert e8.shape == (A + 1, A + 1)
    np.testing.assert_array_equal(e8[:A, :A], subst)
    assert (e8[A, :] == sw_pallas.PAD_SCORE8).all()
    assert (e8[:, A] == sw_pallas.PAD_SCORE8).all()


# ---------------------------------------------------------------------------
# Banded Pallas SW kernel: both layouts vs the exact banded DP
# (interpret mode on CPU)
# ---------------------------------------------------------------------------


def _band_case(seed=11):
    from lambda_tpu.ops import sw_pallas

    A = 27
    rng = np.random.default_rng(seed)
    subst = rng.integers(-4, 6, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, rng.integers(4, 12, size=A))
    e8 = sw_pallas.extend_matrix8(subst)
    B = 5
    q = rng.integers(0, A, size=(B, 40)).astype(np.int32)
    s = rng.integers(0, A, size=(B, 52)).astype(np.int32)
    d = np.array([12, 7, 3, 12, 9], dtype=np.int32)
    return subst, e8, q, s, d


@pytest.mark.parametrize("layout", ["lane", "sublane"])
def test_sw_band_layouts_match_reference(monkeypatch, layout):
    from lambda_tpu.ops import sw_band

    monkeypatch.setattr(sw_band, "_LAYOUT", layout)
    # tiny tiles: interpret mode emulates the kernel grid in Python and
    # full 512-sublane tiles take hours (CLAUDE.md)
    monkeypatch.setattr(sw_band, "_BT_CAP", 8)
    monkeypatch.setattr(sw_band, "_BTL_CAP", 128)
    subst, e8, q, s, d = _band_case()
    got = sw_band.sw_band_score_pallas(q, s, d, e8, -12, -1, interpret=True)
    want = [sw_band.sw_band_reference(q[b], s[b], int(d[b]), subst, -12, -1)
            for b in range(len(d))]
    assert list(got) == want


def test_sw_band_query_wider_than_window(monkeypatch):
    """A query array wider than the padded window must not crash the host
    entry points: rows beyond the last window column are out of band for
    every cell (band offsets are non-negative), so clipping to N columns
    is exact.  Found by randomized differential stress (round 3)."""
    from lambda_tpu.ops import sw_band, sw_pallas

    monkeypatch.setattr(sw_band, "_BT_CAP", 8)
    monkeypatch.setattr(sw_band, "_BTL_CAP", 128)
    rng = np.random.default_rng(5)
    A = 6
    subst = rng.integers(-4, 3, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, rng.integers(2, 7, size=A))
    e8 = sw_pallas.extend_matrix8(subst)
    B = 2
    q = rng.integers(0, A, size=(B, 33)).astype(np.int32)
    s = rng.integers(0, A, size=(B, 12)).astype(np.int32)
    s[0, :12] = q[0, :12]  # guarantee a real hit inside the window
    d = np.array([3, 5], dtype=np.int32)
    got = sw_band.sw_band_score_pallas(q, s, d, e8, -9, -2, interpret=True)
    want = [sw_band.sw_band_reference(q[b], s[b], int(d[b]), subst, -9, -2)
            for b in range(B)]
    assert list(got) == want
    sc, traces = sw_band.sw_band_align_pallas(q, s, d, e8, -9, -2,
                                              interpret=True)
    assert list(sc) == want
    q0, s0, ops = traces[0]
    assert sw_xla.score_of_ops(q[0], s[0], q0, s0, ops, subst, -9, -2) \
        == want[0]


# ---------------------------------------------------------------------------
# X-drop early termination (LAMBDA_SW_XDROP) — semantics pinned against the
# scalar chunk-granular reference (interpret mode)
# ---------------------------------------------------------------------------


def _xdrop_setup(monkeypatch):
    from lambda_tpu.ops import sw_band, sw_pallas

    monkeypatch.setattr(sw_band, "_BT_CAP", 8)
    monkeypatch.setattr(sw_band, "_BTL_CAP", 128)
    # force a small column chunk so the X-drop check fires inside the
    # test-sized window (production NC is 2048)
    orig_plan = sw_band._plan

    def small_nc(Ns, D, layout=None):
        N, W, BROWS, NC, JB = orig_plan(Ns, D, layout)
        return N, W, BROWS, 16, JB

    monkeypatch.setattr(sw_band, "_plan", small_nc)
    A = 4
    subst = np.full((A, A), -10, dtype=np.int32)
    np.fill_diagonal(subst, 5)
    e8 = sw_pallas.extend_matrix8(subst)
    # m1 (20 matches), deep trough (40 mismatches), m2 (30 matches):
    # exact banded best restarts after the trough (150); with a small X
    # the alignment is latched dead inside the trough (100)
    q = np.zeros((1, 90), dtype=np.int32)
    s = np.zeros((1, 90), dtype=np.int32)
    q[0, 20:60] = 1
    s[0, 20:60] = 2
    q[0, 60:90] = s[0, 60:90] = 3
    d = np.zeros(1, dtype=np.int32)
    return sw_band, subst, e8, q, s, d


def test_xdrop_large_x_is_exact(monkeypatch):
    sw_band, subst, e8, q, s, d = _xdrop_setup(monkeypatch)
    monkeypatch.setattr(sw_band, "_XDROP", 10000)
    got = sw_band.sw_band_score_pallas(q, s, d, e8, -12, -1, interpret=True)
    assert int(got[0]) == sw_band.sw_band_reference(
        q[0], s[0], 0, subst, -12, -1) == 150


def test_xdrop_small_x_latches_dead(monkeypatch):
    sw_band, subst, e8, q, s, d = _xdrop_setup(monkeypatch)
    monkeypatch.setattr(sw_band, "_XDROP", 16)
    got = sw_band.sw_band_score_pallas(q, s, d, e8, -12, -1, interpret=True)
    want = sw_band.sw_band_xdrop_reference(q[0], s[0], 0, subst, -12, -1,
                                           x_drop=16, nc=16)
    assert int(got[0]) == want == 100
    # exact banded DP disagrees: the documented trough-restart miss
    assert sw_band.sw_band_reference(q[0], s[0], 0, subst, -12, -1) == 150


def test_xdrop_batch_composition_invariant(monkeypatch):
    """A latched-dead alignment must not revive because a tile-mate is
    still alive: scores are identical alone vs batched with a
    long-running high scorer."""
    sw_band, subst, e8, q, s, d = _xdrop_setup(monkeypatch)
    monkeypatch.setattr(sw_band, "_XDROP", 16)
    alone = sw_band.sw_band_score_pallas(q, s, d, e8, -12, -1,
                                         interpret=True)
    q2 = np.zeros((2, 90), dtype=np.int32)
    s2 = np.zeros((2, 90), dtype=np.int32)
    q2[0], s2[0] = q[0], s[0]
    q2[1] = s2[1] = 2          # 90 matches: alive to the last column
    d2 = np.zeros(2, dtype=np.int32)
    both = sw_band.sw_band_score_pallas(q2, s2, d2, e8, -12, -1,
                                        interpret=True)
    assert int(both[0]) == int(alone[0]) == 100
    assert int(both[1]) == 450


def test_xdrop_xla_fallback_matches_reference():
    """The pure-XLA chunk-granular X-drop (sw_xla.sw_xdrop_score_batch,
    the LAMBDA_SW_XDROP fallback when neither pallas nor the native lib
    run pass 1) must equal the scalar reference on random ragged
    batches with assorted bands and chunk sizes — the same contract the
    pallas lane kernel and the native kernel are pinned to."""
    import jax.numpy as jnp

    from lambda_tpu.ops import sw_band, sw_xla

    rng = np.random.default_rng(11)
    A = 10
    subst = rng.integers(-4, 3, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, 5)
    ext = sw_xla.extend_matrix(subst)
    PAD = A
    for trial in range(12):
        B = int(rng.integers(1, 5))
        M = int(rng.integers(5, 40))
        D = int(rng.integers(1, 15))
        N = M + D
        nc = rng.integers(1, 9, size=B).astype(np.int32)
        x = int(rng.integers(1, 30))
        qs = rng.integers(0, A, size=(B, M)).astype(np.int32)
        ss = rng.integers(0, A, size=(B, N)).astype(np.int32)
        qlen = rng.integers(3, M + 1, size=B)
        slen = rng.integers(3, N + 1, size=B)
        band = rng.integers(0, D + 1, size=B).astype(np.int32)
        for b in range(B):
            qs[b, qlen[b]:] = PAD
            ss[b, slen[b]:] = PAD
        got = np.asarray(sw_xla.sw_xdrop_score_batch(
            jnp.asarray(qs), jnp.asarray(ss), jnp.asarray(ext), -12, -1,
            jnp.asarray(band), jnp.asarray(nc), x))
        for b in range(B):
            want = sw_band.sw_band_xdrop_reference(
                qs[b, :qlen[b]], ss[b, :slen[b]], int(band[b]), subst,
                -12, -1, x_drop=x, nc=int(nc[b]))
            assert got[b] == want, (trial, b, got[b], want)


def test_xdrop_xla_trough_case():
    """The XLA fallback reproduces the documented trough-restart miss
    exactly where the pallas kernel does (same scenario as
    test_xdrop_small_x_latches_dead)."""
    import jax.numpy as jnp

    from lambda_tpu.ops import sw_band, sw_xla

    A = 4
    subst = np.full((A, A), -10, dtype=np.int32)
    np.fill_diagonal(subst, 5)
    ext = sw_xla.extend_matrix(subst)
    q = np.zeros((1, 90), dtype=np.int32)
    s = np.zeros((1, 90), dtype=np.int32)
    q[0, 20:60] = 1
    s[0, 20:60] = 2
    q[0, 60:90] = s[0, 60:90] = 3
    d = np.zeros(1, dtype=np.int32)
    got = np.asarray(sw_xla.sw_xdrop_score_batch(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ext), -12, -1,
        jnp.asarray(d), jnp.asarray(np.array([16], np.int32)), 16))
    assert int(got[0]) == sw_band.sw_band_xdrop_reference(
        q[0], s[0], 0, subst, -12, -1, x_drop=16, nc=16) == 100
    # with a huge X it equals the exact banded DP
    got2 = np.asarray(sw_xla.sw_xdrop_score_batch(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ext), -12, -1,
        jnp.asarray(d), jnp.asarray(np.array([16], np.int32)), 10000))
    assert int(got2[0]) == sw_band.sw_band_reference(
        q[0], s[0], 0, subst, -12, -1) == 150


def test_plan_column_padding_is_tight():
    """_plan must not inflate N beyond the NC chunk rounding: the
    retired MXU stride-shear image was the only consumer of 512-block
    rounding, which cost up to ~1.8x DP work and image HBM on windows
    past 512 columns (e.g. the (qlen 512, band 39) bucket)."""
    from lambda_tpu.ops import sw_band

    for Ns, D in ((551, 39), (1063, 39), (783, 15), (290, 34)):
        N, W, BROWS, NC, JB = sw_band._plan(Ns, D)
        assert N % NC == 0
        assert N - max(Ns, W) < NC + 8, (Ns, D, N, NC)
        assert JB == N
