"""Database streaming (--db-stream N): byte-parity of sequentially
streamed host-resident shards with the single-resident-index search and
with the --db-shards device mesh.

This is the operational envelope the reference gets from host RAM
(search_algo.hpp:126-155: checkRAM bounds the database by RAM, not by
accelerator memory): a database larger than device HBM must still
complete, with output bytes identical to every other deployment shape
(the repo's determinism guarantee).
"""

import numpy as np
import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import GYRA, run_cli


@pytest.fixture(scope="module")
def db_and_query(tmp_path_factory):
    d = tmp_path_factory.mktemp("db_stream")
    rng = np.random.default_rng(11)
    AA = "ARNDCQEGHILKMFPSTWYV"
    recs = [fasta.SeqRecord("GYRA_ECOLI gyrase", GYRA.encode())]
    for i in range(23):
        recs.append(fasta.SeqRecord(
            f"rand{i}",
            "".join(rng.choice(list(AA), int(rng.integers(120, 350))))
            .encode()))
    db = d / "db.fasta"
    fasta.write_fasta(db, recs)
    qs = [fasta.SeqRecord("q_gyra", GYRA[40:140].encode())]
    for i in range(9):
        if i % 3 != 2:  # mutated homolog fragments
            src = recs[1 + (i * 5) % 23].seq.decode()
            st = int(rng.integers(0, max(1, len(src) - 90)))
            frag = list(src[st:st + 85])
            for _ in range(8):
                frag[int(rng.integers(0, len(frag)))] = \
                    str(rng.choice(list(AA)))
            qs.append(fasta.SeqRecord(f"q{i}", "".join(frag).encode()))
        else:           # true negative
            qs.append(fasta.SeqRecord(
                f"q{i}", "".join(rng.choice(list(AA), 85)).encode()))
    q = d / "q.fasta"
    fasta.write_fasta(q, qs)
    lit = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    return d, db, q, lit


def _search(d, q, lit, tag, *extra):
    out = d / f"out_{tag}.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0", *extra)
    assert r.returncode == 0, r.stderr
    return out.read_bytes()


def test_stream_parity_default_config(db_and_query):
    """DEFAULT config (adaptive seeding ON, iterative two-phase ON,
    half-exact delta=1): streamed shards must be byte-identical to the
    resident index AND to the device-mesh sharding."""
    d, db, q, lit = db_and_query
    base = _search(d, q, lit, "base")
    assert base.strip(), "fixture must produce matches"
    assert _search(d, q, lit, "st2", "--db-stream", "2") == base
    assert _search(d, q, lit, "st5", "--db-stream", "5") == base
    assert _search(d, q, lit, "mesh2", "--db-shards", "2") == base


def test_stream_parity_pigeonhole(db_and_query):
    """delta >= 2 (pigeonhole seeding): the whole-seed abundance cutoff +
    adaptive elongation run on host-accumulated verified counts — must
    equal the single-index decisions, adaptive on AND off."""
    d, db, q, lit = db_and_query
    for adapt in ("1", "0"):
        args = ("--seed-delta", "2", "--seed-half-exact", "0",
                "--adaptive-seeding", adapt, "--search0", "0")
        base = _search(d, q, lit, f"d2a{adapt}", *args)
        assert base.strip()
        assert _search(d, q, lit, f"d2a{adapt}s3", "--db-stream", "3",
                       *args) == base


def test_stream_parity_nonadaptive_exact(db_and_query):
    d, db, q, lit = db_and_query
    args = ("--adaptive-seeding", "0", "--seed-delta", "0")
    base = _search(d, q, lit, "ex", *args)
    assert _search(d, q, lit, "ex3", "--db-stream", "3", *args) == base


def test_stream_prebuilt_sharded_artifact(db_and_query):
    """mkindex --shards N artifacts feed the stream passes directly
    (shard_prebuilt_index path) when the counts match, and re-derive
    otherwise — both byte-identical."""
    d, db, q, lit = db_and_query
    lit3 = d / "db_s3.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit3), "-v", "0",
                "--shards", "3")
    assert r.returncode == 0, r.stderr
    base = _search(d, q, lit, "pb_base")
    assert _search(d, q, lit3, "pb3", "--db-stream", "3") == base
    assert _search(d, q, lit3, "pb2", "--db-stream", "2") == base


def test_stream_bisulfite_parity(tmp_path):
    """Bisulfite mode streams too (fwd/rev matrix selection rides the
    frame-id parity, which subject-contiguous shards preserve)."""
    rng = np.random.default_rng(3)
    DNA = "ACGT"
    recs = [fasta.SeqRecord(
        f"s{i}", "".join(rng.choice(list(DNA), 300)).encode())
        for i in range(8)]
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, recs)
    qs = []
    for i in range(4):
        src = list(recs[i].seq.decode()[50:150])
        # C->T conversions (bisulfite reads)
        for j, c in enumerate(src):
            if c == "C" and rng.random() < 0.7:
                src[j] = "T"
        qs.append(fasta.SeqRecord(f"q{i}", "".join(src).encode()))
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, qs)
    lit = tmp_path / "db.lit"
    r = run_cli("mkindexbs", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr

    def search(tag, *extra):
        out = tmp_path / f"o_{tag}.m8"
        r = run_cli("searchbs", "-q", str(q), "-i", str(lit), "-o",
                    str(out), "-v", "0", "-e", "0.1", *extra)
        assert r.returncode == 0, r.stderr
        return out.read_bytes()

    base = search("base")
    assert base.strip()
    assert search("st3", "--db-stream", "3") == base


def test_stream_budget_retry_parity(db_and_query):
    """Tiny per-shard hit budgets force the overflow retry through the
    streaming path (pass-B re-dispatch; decisions recomputed for
    pigeonhole) — results must still match the generous-budget run."""
    from lambda_tpu import options as opt_mod
    from lambda_tpu.search import pipeline
    from lambda_tpu.stats import StatsHolder
    from lambda_tpu import alphabets as ab

    d, db, q, lit = db_and_query

    def run(stream, max_hits):
        opt = opt_mod.make_search_options(
            opt_mod.Domain.PROTEIN, query_file=str(q), index_file=str(lit),
            output=str(d / "x.m8"), verbosity=0,
            max_hits_per_query_frame=max_hits)
        opt.db_stream = stream
        ctx = pipeline.SearchContext(opt)
        seqs = [ab.encode(r.seq, ctx.qry_orig_alph)
                for r in fasta.read_fasta(str(q))]
        st = StatsHolder()
        res = ctx.process_batch(seqs, opt.search_opts, st)
        rows = sorted(
            (qi, bm.n_s_id, bm.q_start, bm.q_end, bm.s_start, bm.s_end,
             bm.raw_score)
            for qi, ms in res.items() for bm in ms)
        return rows, st

    ref, _ = run(1, 2048)
    tiny, st = run(3, 4)   # 4*8=32 hit slots/shard: must overflow+retry
    assert tiny == ref
    big, _ = run(3, 2048)
    assert big == ref


def test_stream_mesh_conflict_refused(db_and_query):
    d, db, q, lit = db_and_query
    out = d / "refused.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0", "--db-stream", "2", "--db-shards", "2")
    assert r.returncode != 0
    assert "db-stream" in (r.stderr + r.stdout)
