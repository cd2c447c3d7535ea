"""Realistic-scale corpus benchmark (VERDICT round 3, next #2).

Builds a synthetic protein database of ``n_residues`` (default 10^8,
~100 MB), then measures:

* mkindex wall time + peak RSS + artifact size (on-disk)
* index load + SearchContext setup wall time, device-resident bytes
* searchp throughput on a BLAST-shaped query mix (mutated homolog
  fragments + true negatives) with the per-phase split

Prints one JSON line per stage.  The reference envelope being matched is
host-RAM-bounded indexing/search (search_algo.hpp:126-155,
mkindex_algo.hpp:60-67).

Usage: python tools/bench_scale.py [n_residues] [n_queries] [--shards N]
"""

import json
import os
import resource
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lambda_tpu/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_res = int(float(args[0])) if args else 100_000_000
    n_q = int(args[1]) if len(args) > 1 else 1024
    shards = 0
    if "--shards" in sys.argv:
        shards = int(sys.argv[sys.argv.index("--shards") + 1])
    work = os.environ.get("LAMBDA_SCALE_DIR", "/tmp/lambda_scale")
    os.makedirs(work, exist_ok=True)

    from lambda_tpu import alphabets as ab
    from lambda_tpu import options as opt_mod
    from lambda_tpu.index import artifact
    from lambda_tpu.io import fasta
    from lambda_tpu.search import pipeline
    from lambda_tpu.stats import StatsHolder

    rng = np.random.default_rng(0)
    AA = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    seq_len = 500
    n_db = n_res // seq_len

    db_path = f"{work}/db_{n_res}.fasta"
    if not os.path.exists(db_path):
        t0 = time.perf_counter()
        with open(db_path, "wb") as fh:
            chunk = 2000           # sequences per write
            for lo in range(0, n_db, chunk):
                hi = min(lo + chunk, n_db)
                block = AA[rng.integers(0, 20, (hi - lo, seq_len))]
                out = bytearray()
                for i in range(hi - lo):
                    out += b">s%d\n" % (lo + i)
                    out += block[i].tobytes() + b"\n"
                fh.write(out)
        print(json.dumps({"stage": "gen_db", "residues": n_db * seq_len,
                          "fasta_mb": round(os.path.getsize(db_path) / 1e6, 1),
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    lit = f"{work}/db_{n_res}{'_s%d' % shards if shards else ''}.lit"
    if not os.path.exists(lit):
        t0 = time.perf_counter()
        iopts = opt_mod.IndexerOptions(domain=opt_mod.Domain.PROTEIN,
                                       db_file=db_path, index_file=lit)
        if shards:
            iopts.shards = shards
        idx = artifact.build_index(iopts)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        artifact.save_index(idx, lit)
        t_save = time.perf_counter() - t0
        size = os.path.getsize(lit) + sum(
            os.path.getsize(artifact.shard_path(lit, k))
            for k in range(shards) if os.path.exists(
                artifact.shard_path(lit, k)))
        print(json.dumps({
            "stage": "mkindex", "residues": n_db * seq_len,
            "build_s": round(t_build, 1), "save_s": round(t_save, 1),
            "rate_Mres_per_s": round(n_db * seq_len / t_build / 1e6, 2),
            "artifact_mb": round(size / 1e6, 1),
            "peak_rss_gb": round(_rss_gb(), 2),
            "rss_bytes_per_residue": round(_rss_gb() * 1e9
                                           / (n_db * seq_len), 1)}),
            flush=True)
        del idx

    # --- search
    t0 = time.perf_counter()
    opt = opt_mod.make_search_options(
        opt_mod.Domain.PROTEIN, query_file=db_path,
        index_file=lit, output=f"{work}/out.m8", verbosity=0)
    ctx = pipeline.SearchContext(opt)
    t_load = time.perf_counter() - t0
    kb = (ctx.idx.kmer.keys.nbytes + ctx.idx.kmer.pos.nbytes * 2
          if ctx.idx.kmer is not None else 0)
    print(json.dumps({
        "stage": "load", "wall_s": round(t_load, 1),
        "device_index_mb": round((kb + len(ctx.idx.trans_concat)) / 1e6, 1),
        "bucket_m": ctx.bucket_m,
        "peak_rss_gb": round(_rss_gb(), 2)}), flush=True)

    # BLAST-shaped queries: 70% homolog fragments (10% mutations), 30%
    # true negatives (random sequences — should mostly die in seeding)
    qs: list = []
    rng2 = np.random.default_rng(1)
    AA_list = list("ARNDCQEGHILKMFPSTWYV")
    for i in range(n_q):
        if i % 10 < 7:
            qs.append(None)       # homolog slot: filled from the file below
        else:
            qs.append(ab.encode(AA[rng2.integers(0, 20, 120)].tobytes(),
                                ctx.qry_orig_alph))
    # read real fragments for the homolog slots by streaming the FASTA
    need = [i for i, q in enumerate(qs) if q is None]
    picks = set(int(x) for x in rng2.integers(0, min(n_db, 20000),
                                              len(need)))
    frags = []
    for j, rec in enumerate(fasta.iter_seqs(db_path)):
        if j in picks:
            s = rec.seq.decode()
            st = int(rng2.integers(0, seq_len - 130))
            frag = list(s[st:st + 120])
            for _ in range(12):
                frag[int(rng2.integers(0, 120))] = AA_list[
                    int(rng2.integers(0, 20))]
            frags.append("".join(frag))
            if len(frags) >= len(need):
                break
        if j > 20000:
            break
    for i, f in zip(need, frags):
        qs[i] = ab.encode(f.encode(), ctx.qry_orig_alph)
    qs = [q for q in qs if q is not None]

    B = opt.query_batch_size
    batches = [qs[i:i + B] for i in range(0, len(qs), B)]
    warm = StatsHolder()
    ctx.process_batch(batches[0], opt.search_opts, warm)
    st = StatsHolder()
    t0 = time.perf_counter()
    n_done = 0
    for b in batches:
        ctx.process_batch(b, opt.search_opts, st)
        n_done += len(b)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "search", "queries_per_s": round(n_done / dt, 2),
        "n_queries": n_done, "db_residues": n_db * seq_len,
        "gcups_equiv": round(n_done * 120 * n_db * seq_len / dt / 1e9, 1),
        "phase_s": {
            "seed": round(st.time_seed, 3),
            "locate": round(st.time_locate, 3),
            "merge": round(st.time_merge, 3),
            "extend": round(st.time_extend, 3),
            "extend_trace": round(st.time_extend_trace, 3),
            "write": round(st.time_write, 3)},
        "hits_located": st.hits_after_seeding,
        "peak_rss_gb": round(_rss_gb(), 2)}), flush=True)


if __name__ == "__main__":
    main()
