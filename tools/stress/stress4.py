"""Randomized prescore stress: the fused seeder's per-hit `passed` flag
vs a scalar oracle of seedLooksPromising (search_algo.hpp:426-481)."""
import os
import sys

import numpy as np
import jax.numpy as jnp

TRIALS = int(os.environ.get("STRESS_TRIALS", "40"))
SEED = int(os.environ.get("STRESS_SEED", "0"))

sys.path.insert(0, "/root/repo")
from lambda_tpu import frames as fr
from lambda_tpu.index.build import build_kmer_index, bits_for_alphabet
from lambda_tpu.search import seeding
from tests.test_seeding_sensitivity import _base_cfg


def run_seeder_passed(cfg, subjects, qfs, subst, unknown_rank=99):
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
    st = {kk: int(v) for kk, v in res["stats"].items()}
    assert st["hits_overflow"] == 0 and st["cursors_overflow"] == 0
    sel = np.nonzero(h["valid"])[0]
    return [((int(h["q_frame"][i]), int(h["q_begin"][i]),
              int(h["seed_len"][i]), int(h["s_frame"][i]),
              int(h["s_off"][i])), bool(h["passed"][i])) for i in sel]


def oracle_promising(qseq, sseq, qb, sb, seed_len, pre_scoring,
                     thresh_f, subst):
    """Transcription of search_algo.hpp:426-481 (independent of the
    device implementation's centering algebra)."""
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


fails = 0
for t in range(TRIALS):
    rng = np.random.default_rng(SEED * 4241 + t)
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
    subjects = []
    for i in range(int(rng.integers(1, 4))):
        L = int(rng.integers(k + 4, 150))
        subjects.append(rng.integers(0, A, size=L).astype(np.uint8))
    qfs = []
    for i in range(int(rng.integers(1, 4))):
        if rng.random() < 0.6:
            src = subjects[int(rng.integers(0, len(subjects)))]
            L = int(rng.integers(k, min(70, len(src)) + 1))
            st0 = int(rng.integers(0, len(src) - L + 1))
            f = src[st0:st0 + L].copy()
            for j in range(delta + 1):
                p = int(rng.integers(0, len(f)))
                f[p] = (f[p] + 1 + j) % A
        else:
            f = rng.integers(0, A, size=int(rng.integers(k, 70))) \
                .astype(np.uint8)
        qfs.append(f)

    ctx = dict(trial=t, A=A, delta=delta, k=k, pre=pre, th=th)
    try:
        got = run_seeder_passed(cfg, subjects, qfs, subst)
    except Exception as e:
        fails += 1
        print(f"CRASH trial={t}: {type(e).__name__}: {e} ctx={ctx}",
              flush=True)
        continue
    for (g, b, sl, sf, off), passed in got:
        want = oracle_promising(qfs[g], subjects[sf], b, off, sl, pre,
                                th, subst)
        if passed != want:
            fails += 1
            print(f"FAIL trial={t}: hit {(g, b, sl, sf, off)} passed="
                  f"{passed} want={want} ctx={ctx}", flush=True)
    if (t + 1) % 10 == 0:
        print(f"# {t + 1}/{TRIALS}, {fails} failures", flush=True)

print(f"DONE trials={TRIALS} failures={fails}")
sys.exit(1 if fails else 0)
