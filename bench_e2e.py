"""End-to-end throughput benchmark: queries/s/chip for searchp.

Not run by the driver (bench.py owns the single JSON line); this script
measures the steady-state pipeline rate the way a serving deployment
would see it: index + queries resident, per-batch wall time after the
first (compiling) batch.

Usage: python bench_e2e.py [n_queries] [db_seqs]
"""

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

    from lambda_tpu import alphabets as ab
    from lambda_tpu import options as opt_mod
    from lambda_tpu.io import fasta
    from lambda_tpu.search import pipeline
    from lambda_tpu.stats import StatsHolder

    rng = np.random.default_rng(0)
    AA = "ARNDCQEGHILKMFPSTWYV"
    with tempfile.TemporaryDirectory() as d:
        db = [fasta.SeqRecord(f"s{i}",
                              "".join(rng.choice(list(AA), 400)).encode())
              for i in range(n_db)]
        fasta.write_fasta(f"{d}/db.fasta", db)
        from lambda_tpu.index import artifact
        iopts = opt_mod.IndexerOptions(domain=opt_mod.Domain.PROTEIN,
                                       db_file=f"{d}/db.fasta",
                                       index_file=f"{d}/db.lit")
        artifact.save_index(artifact.build_index(iopts), f"{d}/db.lit")

        opt = opt_mod.make_search_options(
            opt_mod.Domain.PROTEIN, query_file=f"{d}/db.fasta",
            index_file=f"{d}/db.lit", output=f"{d}/out.m8", verbosity=0)
        # operating-point knobs (PERF.md measurements)
        if os.environ.get("LAMBDA_E2E_QBATCH"):
            opt.query_batch_size = int(os.environ["LAMBDA_E2E_QBATCH"])
        if os.environ.get("LAMBDA_E2E_STREAM"):
            opt.db_stream = int(os.environ["LAMBDA_E2E_STREAM"])
        ctx = pipeline.SearchContext(opt)

        # BLAST-shaped query mix (VERDICT round 3 weak #6): 70% homolog
        # fragments with 10% mutations, 30% true negatives (random
        # sequences that should die in seeding/prescore), so the funnel
        # — not just extension — is what's timed
        qs = []
        for i in range(n_q):
            if i % 10 < 7:
                src = db[rng.integers(0, n_db)].seq.decode()
                st = rng.integers(0, 250)
                frag = list(src[st:st + 120])
                for _ in range(12):
                    frag[rng.integers(0, len(frag))] = rng.choice(list(AA))
                q = "".join(frag)
            else:
                q = "".join(rng.choice(list(AA), 120))
            qs.append(ab.encode(q.encode(), ctx.qry_orig_alph))

        B = opt.query_batch_size
        batches = [qs[i:i + B] for i in range(0, len(qs), B)]
        # pass 1 warms/compiles EVERY batch's bucket shapes; pass 2 is
        # the steady-state measurement (remote compiles are minutes per
        # shape and must not pollute the throughput number)
        warm = StatsHolder()
        for b in batches:
            ctx.process_batch(b, opt.search_opts, warm)
        st = StatsHolder()
        t0 = time.perf_counter()
        n_done = 0
        for b in batches:
            ctx.process_batch(b, opt.search_opts, st)
            n_done += len(b)
        dt = time.perf_counter() - t0
        tail = st.time_extend_trace + st.time_write
        total_phase = (st.time_seed + st.time_locate + st.time_merge
                       + st.time_extend + st.time_extend_trace
                       + st.time_write)
        print(json.dumps({
            "metric": "searchp queries/s/chip (steady state)",
            "value": round(n_done / dt, 2),
            "unit": "queries/s",
            "n_queries": n_done,
            "db_residues": n_db * 400,
            "phase_s": {
                "seed": round(st.time_seed, 3),
                "locate": round(st.time_locate, 3),
                "merge": round(st.time_merge, 3),
                "extend": round(st.time_extend, 3),
                "extend_trace": round(st.time_extend_trace, 3),
                "write": round(st.time_write, 3),
            },
            "trace_write_frac": round(tail / max(total_phase, 1e-9), 3),
            # kernel operating point actually fed by the pipeline
            # (vs the GCUPS-vs-B curve in docs/PERF.md section 1)
            "ext_rows_per_dispatch": round(
                st.ext_dispatch_rows / max(st.ext_dispatches, 1), 1),
            "ext_dispatches": st.ext_dispatches,
        }))


if __name__ == "__main__":
    main()
