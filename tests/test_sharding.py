"""Multi-device sharding tests on the virtual CPU mesh.

SURVEY.md §4: distributed merging must be validated by asserting
shard-count INVARIANCE of results — the merged per-query top-k must be
identical no matter how many database shards the index is split into."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lambda_tpu import frames as fr
from lambda_tpu.parallel import mesh as pmesh


def _run(n_q_axis: int, n_db: int, cfg, frames, red_q, trans_q, subst_ext):
    devices = np.array(jax.devices("cpu")[: n_q_axis * n_db]).reshape(
        n_q_axis, n_db)
    mesh = Mesh(devices, ("q", "db"))
    red_frames = [f.astype(np.uint8) for f in frames]
    shards = pmesh.shard_index(red_frames, cfg.alphabet_size, n_db,
                               words=cfg.words)
    stacked = pmesh.stack_shards(shards, total_frames=len(frames))

    smax = max(int(offs[-1]) for (_, _, offs) in shards)
    sbj = np.zeros((n_db, smax), dtype=np.int32)
    sbj_len = np.zeros((n_db,), dtype=np.int32)
    for i, (idx_s, fb, offs) in enumerate(shards):
        lo = int(offs[0])
        hi = int(offs[-1])
        cat = np.concatenate(
            [red_frames[j] for j in range(fb, fb + len(offs) - 1)]) \
            if len(offs) > 1 else np.zeros(0, np.uint8)
        sbj[i, : hi - lo] = cat
        sbj_len[i] = hi - lo

    step = pmesh.make_sharded_search_step(
        mesh, cfg, n_rows_padded=stacked["keys"].shape[1])

    def put(x, spec):
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    merged, db_total = step(
        put(red_q, P("q", None)), put(trans_q, P("q", None)),
        put(stacked["keys"], P("db", None, None)),
        put(stacked["pos"], P("db", None)),
        put(stacked["rows"], P("db")),
        put(sbj, P("db", None)), put(sbj_len, P("db")),
        put(subst_ext, P(None, None)))
    return np.asarray(merged), int(np.asarray(db_total)[0, 0])


@pytest.mark.parametrize("n_db", [1, 2, 4])
def test_shard_count_invariance(n_db):
    cfg = pmesh.StepConfig(seeds_per_query=8, occ_cap=4, window=48, top_k=4)
    frames, red_q, trans_q, subst_ext = pmesh.make_demo_inputs(
        cfg, n_q=8, q_len=32, db_seq_len=256, n_db_frames=8)

    ref, total_ref = _run(1, 1, cfg, frames, red_q, trans_q, subst_ext)
    got, total = _run(8 // n_db if n_db < 8 else 1, n_db, cfg, frames,
                      red_q, trans_q, subst_ext)
    assert total == total_ref == sum(len(f) for f in frames)
    np.testing.assert_array_equal(got, ref)
    assert (ref[:, 0] > 0).any()


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
