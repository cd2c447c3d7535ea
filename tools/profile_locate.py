"""Decompose the locate-phase device time (VERDICT round 3, next #1).

Builds the bench_e2e workload (500x400aa db, homolog-fragment queries),
then times the fused seeding dispatch under ablations so the 2.75 s/batch
can be attributed to stage-1 scan / adaptive elongation / stage-2 locate /
prescore / D2H.

Each timing blocks on a small D2H (np.asarray of a reduced output) per the
remote-link rules in CLAUDE.md.  Prints one JSON line per probe.

Usage: python tools/profile_locate.py [n_queries] [db_seqs]
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lambda_tpu/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_db = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import tempfile

    import jax
    import jax.numpy as jnp

    from lambda_tpu import alphabets as ab
    from lambda_tpu import options as opt_mod
    from lambda_tpu.io import fasta
    from lambda_tpu.search import pipeline, seeding
    from lambda_tpu.stats import StatsHolder

    rng = np.random.default_rng(0)
    AA = "ARNDCQEGHILKMFPSTWYV"
    with tempfile.TemporaryDirectory() as d:
        # LAMBDA_PROFILE_INDEX=<path.lit> profiles against an existing
        # artifact (e.g. the tools/bench_scale.py 10^8 corpus) instead of
        # the built-in toy db; queries are homolog fragments of its
        # FASTA sibling (same stem, .fasta)
        ext_index = os.environ.get("LAMBDA_PROFILE_INDEX")
        if ext_index:
            db_fa = os.path.splitext(ext_index)[0] + ".fasta"
            db = []
            for i, rec in enumerate(fasta.read_fasta(db_fa)):
                db.append(rec)
                if i >= max(n_db, 1000):
                    break
            index_file = ext_index
            # SearchContext peeks the query file for alphabet detection
            fasta.write_fasta(f"{d}/db.fasta", db[:64])
        else:
            db = [fasta.SeqRecord(f"s{i}",
                                  "".join(rng.choice(list(AA), 400)).encode())
                  for i in range(n_db)]
            fasta.write_fasta(f"{d}/db.fasta", db)
            from lambda_tpu.index import artifact
            iopts = opt_mod.IndexerOptions(domain=opt_mod.Domain.PROTEIN,
                                           db_file=f"{d}/db.fasta",
                                           index_file=f"{d}/db.lit")
            artifact.save_index(artifact.build_index(iopts), f"{d}/db.lit")
            index_file = f"{d}/db.lit"

        opt = opt_mod.make_search_options(
            opt_mod.Domain.PROTEIN, query_file=f"{d}/db.fasta",
            index_file=index_file, output=f"{d}/out.m8", verbosity=0)
        ctx = pipeline.SearchContext(opt)

        qs = []
        for i in range(n_q):
            src = db[rng.integers(0, len(db))].seq.decode()
            st = rng.integers(0, max(1, len(src) - 150))
            frag = list(src[st:st + 120])
            for _ in range(12):
                frag[rng.integers(0, len(frag))] = rng.choice(list(AA))
            qs.append(ab.encode("".join(frag).encode(), ctx.qry_orig_alph))

        so = opt.search_opts
        stats = StatsHolder()
        sd = ctx.dispatch_seeding(qs, so, stats)
        np.asarray(sd.res2["stats_vec"])  # warm the real path

        base_cfg, _ = ctx.seeder_for(so)
        print(json.dumps({"probe": "config", "T": int(sd.slot_frame.shape[1]),
                          "Q": sd.Q, "V": "see seeding",
                          "n_steps": base_cfg.n_steps,
                          "max_hits": base_cfg.max_hits,
                          "max_cursors": base_cfg.max_cursors,
                          "ext_max": base_cfg.ext_max,
                          "bucket_m": base_cfg.bucket_m}))

        pigeon = so.max_seed_dist >= 2
        d_red_sbj = ctx.d_red_sbj if pigeon else jnp.zeros(1, jnp.int8)

        common = dict(
            keys=ctx.d_keys, red_q=sd.d_red_q, qlens=sd.d_qlens,
            slot_frame=jnp.asarray(sd.slot_frame),
            slot_begin=jnp.asarray(sd.slot_begin),
            slot_rem=jnp.asarray(sd.slot_rem),
            hits0=jnp.zeros(sd.Q, jnp.int32))

        def fused_args():
            return (common["keys"], common["red_q"], common["qlens"],
                    common["slot_frame"], common["slot_begin"],
                    common["slot_rem"], common["hits0"],
                    ctx.d_pos, ctx.d_frame, ctx.d_sbj_offsets,
                    ctx.d_sbj_lens, ctx.d_trans_sbj, sd.d_trans_q,
                    d_red_sbj, ctx.d_sub_fwd, ctx.d_sub_rev, ctx.d_bucket)

        def stage1_args():
            return (common["keys"], common["red_q"], common["qlens"],
                    common["slot_frame"], common["slot_begin"],
                    common["slot_rem"], common["hits0"], ctx.d_bucket)

        def timeit(name, fn, reps=3, **extra):
            fn()  # warm/compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            print(json.dumps({"probe": name, "best_s": round(min(ts), 4),
                              "all_s": [round(t, 4) for t in ts], **extra}))
            return min(ts)

        def make(cfg):
            return seeding.make_seeder(cfg)

        # --- full fused (what the pipeline runs)
        _, _, fused_full = make(base_cfg)
        timeit("fused_full",
               lambda: np.asarray(fused_full(*fused_args())["stats_vec"]))

        # --- fused ablations
        for name, repl in [
            ("fused_no_adaptive", dict(adaptive=False)),
            ("fused_no_prescore", dict(pre_scoring=0)),
            ("fused_no_both", dict(adaptive=False, pre_scoring=0)),
            ("fused_hits2k", dict(max_hits=2048)),
            ("fused_no_bucket", dict(bucket_m=0)),
        ]:
            cfg2 = dataclasses.replace(base_cfg, **repl)
            _, _, fz = make(cfg2)
            args = list(fused_args())
            if repl.get("bucket_m") == 0:
                args[-1] = None
            timeit(name, lambda fz=fz, args=args:
                   np.asarray(fz(*args)["stats_vec"]))

        # --- stage1 only (dict outputs reduced on device; everything live)
        for name, repl in [
            ("stage1_full", dict()),
            ("stage1_no_adaptive", dict(adaptive=False)),
        ]:
            cfg2 = dataclasses.replace(base_cfg, **repl)
            s1, _, _ = make(cfg2)

            probe = jax.jit(lambda *a: sum(
                jnp.sum(v.astype(jnp.int32)) for v in s1(*a).values()))
            timeit(name, lambda probe=probe:
                   np.asarray(probe(*stage1_args())))

        # --- D2H of the packed hit slice (what collect_batch pulls)
        res = fused_full(*fused_args())
        np.asarray(res["stats_vec"])
        timeit("d2h_packed_full",
               lambda: np.asarray(res["packed"]),
               bytes=int(np.prod(res["packed"].shape)) * 4)


if __name__ == "__main__":
    main()
