"""Sharded index artifact (mkindex --shards N): byte-parity with the
unsharded artifact, direct feeding of device shards, and partial
per-host loading.  Reference contract being extended: the single
self-describing index_file (shared_definitions.hpp:343-379)."""

import numpy as np
import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import GYRA, run_cli


@pytest.fixture(scope="module")
def db_and_query(tmp_path_factory):
    d = tmp_path_factory.mktemp("shard_artifact")
    rng = np.random.default_rng(42)
    AA = "ARNDCQEGHILKMFPSTWYV"
    recs = [fasta.SeqRecord("GYRA_ECOLI gyrase", GYRA.encode())]
    for i in range(7):
        recs.append(fasta.SeqRecord(
            f"rand{i}", "".join(rng.choice(list(AA), 150)).encode()))
    db = d / "db.fasta"
    fasta.write_fasta(db, recs)
    q = d / "q.fasta"
    fasta.write_fasta(q, [
        fasta.SeqRecord("q1", GYRA[50:130].encode()),
        fasta.SeqRecord("q2", recs[4].seq[30:110]),
        fasta.SeqRecord("q3", recs[7].seq[10:100]),
    ])
    return d, db, q


def _mkindex(d, db, tag, *extra):
    lit = d / f"db_{tag}.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0", *extra)
    assert r.returncode == 0, r.stderr
    return lit


def _search(d, q, lit, tag, *extra):
    out = d / f"out_{tag}.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0", "--adaptive-seeding", "0", *extra)
    assert r.returncode == 0, r.stderr
    return out.read_bytes()

def test_sharded_artifact_files(db_and_query):
    d, db, q = db_and_query
    lit = _mkindex(d, db, "s2files", "--shards", "2")
    assert lit.exists()
    assert (d / "db_s2files.lit.shard0").exists()
    assert (d / "db_s2files.lit.shard1").exists()


def test_sharded_artifact_search_parity(db_and_query):
    d, db, q = db_and_query
    lit1 = _mkindex(d, db, "s1")
    lit2 = _mkindex(d, db, "s2", "--shards", "2")
    base = _search(d, q, lit1, "s1")
    assert base.strip()
    # unsharded search of the sharded artifact (lazy global merge)
    assert _search(d, q, lit2, "s2") == base
    # sharded search feeding prebuilt shards directly
    assert _search(d, q, lit2, "s2d2", "--db-shards", "2") == base
    # shard-count mismatch falls back to merge + re-derive
    assert _search(d, q, lit2, "s2d4", "--db-shards", "4") == base


def test_shard_subset_search_union(db_and_query):
    """--shard-subset K searches only that shard's subjects with GLOBAL
    statistics: the union of the two per-host outputs equals the full
    run line-for-line (the multi-host contract: per-host slices merge
    consistently because dbTotalLength/e-values are global)."""
    d, db, q = db_and_query
    lit = _mkindex(d, db, "subset", "--shards", "2")
    full = _search(d, q, lit, "subset_full", "-n", "500")
    s0 = _search(d, q, lit, "subset0", "-n", "500",
                 "--shard-subset", "0")
    s1 = _search(d, q, lit, "subset1", "-n", "500",
                 "--shard-subset", "1")
    lf = set(full.decode().splitlines())
    l0 = set(s0.decode().splitlines())
    l1 = set(s1.decode().splitlines())
    assert l0 and l1
    assert not (l0 & l1)
    assert (l0 | l1) == lf


def test_merge_m8_tool(db_and_query, tmp_path):
    """merge_m8 reassembles per-host outputs: merged line set equals the
    full run and per-query ordering is by (bitScore desc, eValue,
    subject, coords)."""
    from lambda_tpu.tools import merge_m8

    d, db, q = db_and_query
    lit = _mkindex(d, db, "merge", "--shards", "2")
    full = _search(d, q, lit, "merge_full", "-n", "500")
    _search(d, q, lit, "merge0", "-n", "500", "--shard-subset", "0")
    _search(d, q, lit, "merge1", "-n", "500", "--shard-subset", "1")
    out = tmp_path / "merged.m8"
    merge_m8.merge([str(d / "out_merge0.m8"), str(d / "out_merge1.m8")],
                   str(out))
    merged = out.read_text().splitlines()
    assert set(merged) == set(full.decode().splitlines())
    # per-query bitScore (col 12) non-increasing
    last_q, last_bs = None, None
    for ln in merged:
        f = ln.split("\t")
        bs = float(f[11])
        if f[0] == last_q:
            assert bs <= last_bs + 1e-9
        last_q, last_bs = f[0], bs


def test_partial_shard_load(db_and_query):
    d, db, q = db_and_query
    from lambda_tpu.index import artifact

    lit2 = _mkindex(d, db, "s2partial", "--shards", "2")
    full = artifact.load_index(str(lit2))
    part = artifact.load_index(str(lit2), shards=[0])
    assert part.loaded_shards == [0]
    assert part.kmer_shards[1].num_positions == 0
    assert part.kmer_shards[0].num_positions == \
        full.kmer_shards[0].num_positions
    assert sum(s.num_positions for s in full.kmer_shards) > \
        part.kmer_shards[0].num_positions
    with pytest.raises(RuntimeError):
        part.get_kmer()
    # merged equals a from-scratch unsharded build
    lit1 = d / "db_s1.lit"
    if lit1.exists():
        ref = artifact.load_index(str(lit1))
        got = full.get_kmer()
        np.testing.assert_array_equal(got.keys, ref.get_kmer().keys)
        np.testing.assert_array_equal(got.pos, ref.get_kmer().pos)
        np.testing.assert_array_equal(got.frame, ref.get_kmer().frame)
