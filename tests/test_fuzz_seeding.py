"""Bounded randomized differential fuzz of the seeding engine.

Fixed-seed slices of the round-3 stress campaigns (134 + 50 + 50 random
trials offline, zero failures) pinning three reference-semantics
contracts on random corpora:

* located hit sets == the brute-force Hamming-delta occurrence oracle
  (delta 0-3, half-exact on/off; search_algo.hpp:537-604 semantics);
* adaptive elongation == the accept/revert walk oracle on whole-seed
  verified counts (search_algo.hpp:679-726; PARITY.md deviation 3);
* per-hit prescore flags == a scalar transcription of
  seedLooksPromising (search_algo.hpp:426-481), including the
  centering/clipping algebra and the double->int threshold truncation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lambda_tpu import frames as fr
from lambda_tpu.index.build import bits_for_alphabet, build_kmer_index
from lambda_tpu.search import seeding
from tests.test_seeding_sensitivity import (_base_cfg,
                                            _oracle_adaptive_pigeonhole,
                                            _oracle_hamming, _run_seeder)


def _rand_corpus(rng, A, k, delta, n_subj_hi=5, motif=None):
    subjects = []
    for i in range(int(rng.integers(1, n_subj_hi))):
        L = int(rng.integers(k + 4, 150))
        s = rng.integers(0, A, size=L).astype(np.uint8)
        if motif is not None:
            for rep in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, max(1, L - len(motif))))
                s[p:p + len(motif)] = motif[:L - p]
        subjects.append(s)
    qfs = []
    for i in range(int(rng.integers(1, 4))):
        if motif is not None:
            parts = [motif.copy()]
            if rng.random() < 0.7:
                src = subjects[int(rng.integers(0, len(subjects)))]
                st0 = int(rng.integers(0, max(1, len(src) - 40)))
                parts.append(src[st0:st0 + 40].copy())
            f = np.concatenate(parts)
        elif rng.random() < 0.6 and subjects:
            src = subjects[int(rng.integers(0, len(subjects)))]
            L = int(rng.integers(max(4, k // 2), min(70, len(src)) + 1))
            st0 = int(rng.integers(0, len(src) - L + 1)) if len(src) > L \
                else 0
            f = src[st0:st0 + L].copy()
        else:
            f = rng.integers(0, A, size=int(rng.integers(4, 70))) \
                .astype(np.uint8)
        for j in range(delta):
            p = int(rng.integers(0, len(f)))
            f[p] = (f[p] + 1 + j) % A
        if motif is None and rng.random() < 0.2 and len(f) > 2:
            f[int(rng.integers(0, len(f)))] = 99   # unknown char
        qfs.append(f)
    return subjects, qfs


@pytest.mark.parametrize("seed", range(400, 406))
def test_fuzz_seeding_matches_hamming_oracle(seed):
    rng = np.random.default_rng(seed)
    A = int(rng.choice([4, 10, 16]))
    delta = int(rng.integers(0, 4))
    half_exact = bool(rng.integers(0, 2)) if delta > 0 else False
    k = int(rng.integers(8, 17))
    bits = bits_for_alphabet(A)
    cfg = _base_cfg(seed_length=k, seed_offset=int(rng.integers(1, 9)),
                    max_seed_dist=delta, half_exact=half_exact,
                    alphabet_size=A, bits=bits, cpw=32 // bits, words=4,
                    max_matches=1 << 16, max_cursors=1 << 14,
                    max_hits=1 << 16)
    subjects, qfs = _rand_corpus(rng, A, k, delta)
    hits, _ = _run_seeder(cfg, subjects, qfs)
    want = _oracle_hamming(cfg, subjects, qfs,
                           verify_from=k // 2 if half_exact else 0)
    assert hits == want, (seed, len(hits), len(want))


@pytest.mark.parametrize("seed", range(500, 503))
def test_fuzz_adaptive_elongation_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    A = int(rng.choice([4, 10, 16]))
    delta = int(rng.integers(2, 4))
    k = int(rng.integers(8, 15))
    bits = bits_for_alphabet(A)
    cfg = _base_cfg(seed_length=k, seed_offset=int(rng.integers(2, 7)),
                    max_seed_dist=delta, adaptive=True,
                    max_matches=int(rng.choice([1, 2, 8, 64])),
                    alphabet_size=A, bits=bits, cpw=32 // bits, words=4,
                    max_cursors=1 << 14, max_hits=1 << 16)
    motif = rng.integers(0, A, size=k + 12).astype(np.uint8)
    subjects, qfs = _rand_corpus(rng, A, k, delta, n_subj_hi=6, motif=motif)
    hits, _ = _run_seeder(cfg, subjects, qfs)
    want = _oracle_adaptive_pigeonhole(cfg, subjects, qfs)
    assert hits == want, (seed, len(hits), len(want))


def _run_seeder_passed(cfg, subjects, qfs, subst, unknown_rank=99):
    """Like _run_seeder but returns per-located-hit `passed` flags (and
    scores prescore over `subst` rather than the +2/-1 default)."""
    concat, offsets, lengths = fr.concat_frames(subjects)
    idx = build_kmer_index(concat, offsets, cfg.alphabet_size)
    _, _, fused = seeding.make_seeder(cfg)
    slot_frame, slot_begin, slot_rem, T, _ = seeding.compute_seed_slots(
        qfs, 1, unknown_rank, cfg)
    G = len(qfs)
    Lmax = max(len(f) for f in qfs)
    red_q = np.zeros((G, Lmax), np.int32)
    qlens = np.array([len(f) for f in qfs], np.int32)
    for g, f in enumerate(qfs):
        red_q[g, :len(f)] = f
    res = fused(jnp.asarray(idx.keys), jnp.asarray(red_q),
                jnp.asarray(qlens), jnp.asarray(slot_frame),
                jnp.asarray(slot_begin), jnp.asarray(slot_rem),
                jnp.zeros(G, jnp.int32),
                jnp.asarray(idx.pos.astype(np.int32)),
                jnp.asarray(idx.frame.astype(np.int32)),
                jnp.asarray(offsets[:-1].astype(np.int32)),
                jnp.asarray(lengths.astype(np.int32)),
                jnp.asarray(concat.astype(np.int8)),
                jnp.asarray(red_q),
                jnp.asarray(concat.astype(np.int8)),
                jnp.asarray(subst), jnp.asarray(subst))
    h = {kk: np.asarray(v) for kk, v in res.items()
         if kk not in ("stats", "packed", "stats_vec")}
    sel = np.nonzero(h["valid"])[0]
    return [((int(h["q_frame"][i]), int(h["q_begin"][i]),
              int(h["seed_len"][i]), int(h["s_frame"][i]),
              int(h["s_off"][i])), bool(h["passed"][i])) for i in sel]


def _oracle_promising(qseq, sseq, qb, sb, seed_len, pre_scoring,
                      thresh_f, subst):
    """Scalar transcription of seedLooksPromising
    (search_algo.hpp:426-481), independent of the device centering
    algebra."""
    eqb, esb = qb, sb
    actual = seed_len
    eff = max(pre_scoring * seed_len, actual)
    if eff > actual:
        eqb -= (eff - actual) // 2
        esb -= (eff - actual) // 2
        mn = min(eqb, esb)
        if mn < 0:
            eqb -= mn
            esb -= mn
            eff += mn
        eff = min(len(qseq) - eqb, len(sseq) - esb, eff)
    s = 0
    max_score = 0
    thresh = int(thresh_f * eff)
    for i in range(eff):
        s += int(subst[qseq[eqb + i], sseq[esb + i]])
        if s < 0:
            s = 0
        elif s > max_score:
            max_score = s
        if max_score >= thresh:
            return True
    return False


@pytest.mark.parametrize("seed", range(600, 604))
def test_fuzz_prescore_matches_reference_transcription(seed):
    rng = np.random.default_rng(seed)
    A = int(rng.choice([4, 10, 16]))
    delta = int(rng.integers(0, 3))
    k = int(rng.integers(8, 15))
    pre = int(rng.choice([1, 2, 3, 5]))
    th = float(rng.choice([0.3, 0.75, 1.0, 1.4, 1.9]))
    bits = bits_for_alphabet(A)
    cfg = _base_cfg(seed_length=k, seed_offset=int(rng.integers(2, 7)),
                    max_seed_dist=delta, alphabet_size=A,
                    bits=bits, cpw=32 // bits, words=4,
                    pre_scoring=pre, pre_scoring_thresh=th,
                    max_matches=1 << 16, max_cursors=1 << 14,
                    max_hits=1 << 16)
    subst = rng.integers(-3, 2, size=(A, A)).astype(np.int32)
    np.fill_diagonal(subst, rng.integers(1, 6, size=A))
    subjects, qfs = _rand_corpus(rng, A, k, delta, n_subj_hi=4)
    qfs = [np.where(f == 99, 0, f).astype(np.uint8) for f in qfs]
    got = _run_seeder_passed(cfg, subjects, qfs, subst)
    n_checked = 0
    for (g, b, sl, sf, off), passed in got:
        want = _oracle_promising(qfs[g], subjects[sf], b, off, sl, pre,
                                 th, subst)
        assert passed == want, (seed, (g, b, sl, sf, off), passed, want)
        n_checked += 1
    # at least one trial per param set must actually locate hits
    if seed in (600, 601):
        assert n_checked, seed
