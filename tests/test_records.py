"""Unit tests of the _writeRecord list massaging (records.sort_dedup_cutoff,
search_algo.hpp:832-874): permutation invariance and dedup/cutoff semantics.

Determinism is a feature of this framework (CLAUDE.md): a record list
must massage to the same output regardless of the order matches arrive
in (the reference gets this per-thread; here batches/shards reorder)."""

import numpy as np
import pytest

from lambda_tpu.search import records
from lambda_tpu.stats import StatsHolder


def _mk(n_s_id, qs, qe, ss, se, qfs, sfs, bit):
    return records.BlastMatch(
        n_q_id=0, n_s_id=n_s_id, q_frame_shift=qfs, s_frame_shift=sfs,
        q_length=100, s_length=400, q_start=qs, q_end=qe, s_start=ss,
        s_end=se, raw_score=int(bit * 2), ops=[("M", qe - qs)],
        bit_score=bit, e_value=2.0 ** -bit)


def _random_matches(rng, n):
    out = []
    for _ in range(n):
        qs = int(rng.integers(0, 50))
        qe = qs + int(rng.integers(1, 50))
        ss = int(rng.integers(0, 300))
        se = ss + (qe - qs)
        out.append(_mk(int(rng.integers(0, 4)), qs, qe, ss, se,
                       int(rng.choice([-2, 0, 1])),
                       int(rng.choice([-1, 0, 3])),
                       float(rng.integers(20, 60))))
    # force duplicate coordinate keys with differing scores (the
    # dedup-keeps-best path) and exact duplicates
    for i in range(0, n, 3):
        dup = _mk(out[i].n_s_id, out[i].q_start, out[i].q_end,
                  out[i].s_start, out[i].s_end, out[i].q_frame_shift,
                  out[i].s_frame_shift, out[i].bit_score
                  + float(rng.integers(-3, 4)))
        out.append(dup)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sort_dedup_cutoff_permutation_invariant(seed):
    rng = np.random.default_rng(seed)
    base = _random_matches(rng, 30)
    max_matches = 12

    def run(order):
        ms = [base[i] for i in order]
        st = StatsHolder()
        out = records.sort_dedup_cutoff(ms, max_matches, st)
        return [(m.n_s_id, m.q_start, m.q_end, m.s_start, m.s_end,
                 m.q_frame_shift, m.s_frame_shift, m.bit_score)
                for m in out], (st.hits_duplicate2, st.hits_abundant,
                                st.hits_final)

    ref_out, ref_stats = run(range(len(base)))
    assert len(ref_out) == max_matches
    assert ref_stats[2] == max_matches
    # bitScore descending
    assert all(a[7] >= b[7] for a, b in zip(ref_out, ref_out[1:]))
    # dedup: one record per coordinate key, the best-scoring one
    keys = [o[:7] for o in ref_out]
    assert len(set(keys)) == len(keys)
    best = {}
    for m in base:
        k = (m.n_s_id, m.q_start, m.q_end, m.s_start, m.s_end,
             m.q_frame_shift, m.s_frame_shift)
        best[k] = max(best.get(k, -1.0), m.bit_score)
    for o in ref_out:
        assert o[7] == best[o[:7]], o

    for p in range(10):
        order = np.random.default_rng(100 + p).permutation(len(base))
        got_out, got_stats = run(order)
        assert got_out == ref_out, p
        assert got_stats == ref_stats, p
