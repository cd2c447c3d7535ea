"""Randomized seeding stress: fused seeder vs brute-force Hamming oracle.

Covers delta 0-3 x half-exact on/off on random corpora, including short
queries, unknown chars, and repetitive subjects.
"""
import os
import sys

import numpy as np

TRIALS = int(os.environ.get("STRESS_TRIALS", "60"))
SEED = int(os.environ.get("STRESS_SEED", "0"))

sys.path.insert(0, "/root/repo")
from tests.test_seeding_sensitivity import (_run_seeder, _oracle_hamming,
                                            _base_cfg)

fails = 0
for t in range(TRIALS):
    rng = np.random.default_rng(SEED * 7919 + t)
    A = int(rng.choice([4, 10, 16]))
    delta = int(rng.integers(0, 4))
    half_exact = bool(rng.integers(0, 2)) if delta > 0 else False
    k = int(rng.integers(8, 17))
    off = int(rng.integers(1, 9))
    from lambda_tpu.index.build import bits_for_alphabet
    bits = bits_for_alphabet(A)
    cfg = _base_cfg(seed_length=k, seed_offset=off, max_seed_dist=delta,
                    half_exact=half_exact, alphabet_size=A,
                    bits=bits, cpw=32 // bits, words=4,
                    max_matches=1 << 16, max_cursors=1 << 14,
                    max_hits=1 << 16)
    n_subj = int(rng.integers(1, 5))
    subjects = []
    for i in range(n_subj):
        L = int(rng.integers(k, 140))
        s = rng.integers(0, A, size=L).astype(np.uint8)
        if rng.random() < 0.3:   # repetitive block to stress many-hits
            s[: L // 2] = s[0]
        subjects.append(s)
    qfs = []
    for i in range(int(rng.integers(1, 5))):
        kind = rng.random()
        if kind < 0.5 and subjects:
            src = subjects[int(rng.integers(0, n_subj))]
            L = int(rng.integers(max(4, k // 2), min(80, len(src)) + 1))
            st0 = int(rng.integers(0, len(src) - L + 1)) if len(src) > L \
                else 0
            f = src[st0:st0 + L].copy()
            for j in range(delta):
                p = int(rng.integers(0, len(f)))
                f[p] = (f[p] + 1 + j) % A
        else:
            L = int(rng.integers(4, 80))
            f = rng.integers(0, A, size=L).astype(np.uint8)
        if rng.random() < 0.2 and len(f) > 2:   # unknown chars
            f[int(rng.integers(0, len(f)))] = 99
        qfs.append(f)

    ctx = dict(trial=t, A=A, delta=delta, half_exact=half_exact, k=k,
               off=off, slens=[len(s) for s in subjects],
               qlens=[len(f) for f in qfs])
    try:
        hits, st = _run_seeder(cfg, subjects, qfs)
        want = _oracle_hamming(cfg, subjects, qfs,
                               verify_from=k // 2 if half_exact else 0)
    except Exception as e:
        fails += 1
        print(f"CRASH trial={t}: {type(e).__name__}: {e} ctx={ctx}",
              flush=True)
        continue
    if hits != want:
        fails += 1
        extra = sorted(hits - want)[:5]
        miss = sorted(want - hits)[:5]
        print(f"FAIL trial={t}: {len(hits)} got vs {len(want)} want; "
              f"extra={extra} missing={miss} ctx={ctx}", flush=True)
    if (t + 1) % 10 == 0:
        print(f"# {t + 1}/{TRIALS}, {fails} failures", flush=True)

print(f"DONE trials={TRIALS} failures={fails}")
sys.exit(1 if fails else 0)
