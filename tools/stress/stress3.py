"""Randomized adaptive-elongation stress: fused seeder (delta>=2,
adaptive ON) vs the reference-semantics accept/revert oracle."""
import os
import sys

import numpy as np

TRIALS = int(os.environ.get("STRESS_TRIALS", "40"))
SEED = int(os.environ.get("STRESS_SEED", "0"))

sys.path.insert(0, "/root/repo")
from tests.test_seeding_sensitivity import (_run_seeder,
                                            _oracle_adaptive_pigeonhole,
                                            _base_cfg)
from lambda_tpu.index.build import bits_for_alphabet

fails = 0
for t in range(TRIALS):
    rng = np.random.default_rng(SEED * 6133 + t)
    A = int(rng.choice([4, 10, 16]))
    delta = int(rng.integers(2, 4))
    k = int(rng.integers(8, 15))
    off = int(rng.integers(2, 7))
    mm = int(rng.choice([1, 2, 8, 64]))
    bits = bits_for_alphabet(A)
    cfg = _base_cfg(seed_length=k, seed_offset=off, max_seed_dist=delta,
                    adaptive=True, max_matches=mm, alphabet_size=A,
                    bits=bits, cpw=32 // bits, words=4,
                    max_cursors=1 << 14, max_hits=1 << 16)
    n_subj = int(rng.integers(2, 6))
    motif = rng.integers(0, A, size=k + 12).astype(np.uint8)
    subjects = []
    for i in range(n_subj):
        L = int(rng.integers(80, 200))
        s = rng.integers(0, A, size=L).astype(np.uint8)
        for rep in range(int(rng.integers(0, 4))):   # abundant motif
            p = int(rng.integers(0, L - len(motif)))
            s[p:p + len(motif)] = motif
            if p + len(motif) < L:
                s[p + len(motif)] = (i + rep) % A
        subjects.append(s)
    qfs = []
    for i in range(int(rng.integers(1, 4))):
        parts = [motif.copy()]
        if rng.random() < 0.7:
            src = subjects[int(rng.integers(0, n_subj))]
            st0 = int(rng.integers(0, max(1, len(src) - 40)))
            parts.append(src[st0:st0 + 40].copy())
        f = np.concatenate(parts)
        for j in range(delta):
            p = int(rng.integers(0, len(f)))
            f[p] = (f[p] + 1 + j) % A
        qfs.append(f)

    ctx = dict(trial=t, A=A, delta=delta, k=k, off=off, mm=mm,
               slens=[len(s) for s in subjects], qlens=[len(f) for f in qfs])
    try:
        hits, st = _run_seeder(cfg, subjects, qfs)
        want = _oracle_adaptive_pigeonhole(cfg, subjects, qfs)
    except Exception as e:
        fails += 1
        print(f"CRASH trial={t}: {type(e).__name__}: {e} ctx={ctx}",
              flush=True)
        continue
    if hits != want:
        fails += 1
        extra = sorted(hits - want)[:4]
        miss = sorted(want - hits)[:4]
        print(f"FAIL trial={t}: {len(hits)} got vs {len(want)} want; "
              f"extra={extra} missing={miss} ctx={ctx}", flush=True)
    if (t + 1) % 10 == 0:
        print(f"# {t + 1}/{TRIALS}, {fails} failures", flush=True)

print(f"DONE trials={TRIALS} failures={fails}")
sys.exit(1 if fails else 0)
