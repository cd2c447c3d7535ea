"""Pigeonhole seeding (seed-delta >= 2) end-to-end tests.

The reference supports --seed-delta 0..3 via FM search schemes
(search_datastructures.hpp:506-510); here delta >= 2 is chunk-anchor +
verification.  The fixture query mutates a database fragment every 6
positions, so every 14-mer seed window holds >= 2 mismatches: delta <= 1
seeding cannot find it, delta == 2 must."""

import numpy as np
import pytest

from lambda_tpu import alphabets as ab
from lambda_tpu import options as opt_mod
from lambda_tpu.io import fasta
from lambda_tpu.search import pipeline
from lambda_tpu.stats import StatsHolder

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


@pytest.fixture(scope="module")
def db_and_queries(tmp_path_factory):
    d = tmp_path_factory.mktemp("delta")
    rng = np.random.default_rng(17)
    bases = "ACGT"
    seqs = ["".join(rng.choice(list(bases), size=400)) for _ in range(4)]
    db = [fasta.SeqRecord(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    frag = list(seqs[2][100:180])
    for p in range(3, len(frag), 6):
        frag[p] = COMP[frag[p]]
    qs = [fasta.SeqRecord("mut_q", "".join(frag).encode())]
    fasta.write_fasta(d / "db.fasta", db)
    fasta.write_fasta(d / "q.fasta", qs)

    from lambda_tpu.index import artifact
    iopts = opt_mod.IndexerOptions(domain=opt_mod.Domain.NUCLEOTIDE,
                                   db_file=str(d / "db.fasta"),
                                   index_file=str(d / "db.lit"))
    idx = artifact.build_index(iopts)
    artifact.save_index(idx, str(d / "db.lit"))
    return d


def _search(d, delta: int):
    out = str(d / f"out_d{delta}.m8")
    opt = opt_mod.make_search_options(
        opt_mod.Domain.NUCLEOTIDE,
        query_file=str(d / "q.fasta"), index_file=str(d / "db.lit"),
        output=out, verbosity=0)
    opt.search_opts.max_seed_dist = delta
    opt.iterative_search = False
    opt.adaptive_seeding = False
    # the fixture mutates every 6 positions, so no seed has an exact
    # first half: full pigeonhole (errors anywhere) is what's under test
    opt.seed_half_exact = False
    # the fixture is ~17% divergent by construction; the region prescore
    # (reference default) would reject it regardless of seeding mode
    opt.pre_scoring = 0
    pipeline.run_search(opt)
    rows = [l.split("\t") for l in open(out).read().splitlines()
            if l and not l.startswith("#")]
    return rows


def test_delta1_misses_dense_mutations(db_and_queries):
    rows = _search(db_and_queries, 1)
    assert rows == []


def test_delta2_finds_dense_mutations(db_and_queries):
    rows = _search(db_and_queries, 2)
    assert rows, "pigeonhole delta=2 must seed the 2-mismatch windows"
    hit = rows[0]
    assert hit[0] == "mut_q" and hit[1] == "s2"
    # alignment covers the fragment on the right diagonal
    assert int(hit[8]) >= 95 and int(hit[9]) <= 185


def test_delta3_also_finds(db_and_queries):
    rows = _search(db_and_queries, 3)
    assert rows and rows[0][1] == "s2"


def test_pigeon_chunks_partition():
    from lambda_tpu.ops import kmer

    for k in (9, 10, 14, 17):
        for delta in (2, 3):
            off, ln = kmer.pigeon_chunks(k, delta)
            assert len(off) == delta + 1
            assert ln.sum() == k
            assert off[0] == 0
            assert (np.diff(off) == ln[:-1]).all()
            assert ln.min() >= 1


def test_delta2_half_exact_requires_exact_first_half(db_and_queries):
    """With --seed-half-exact (default), delta>=2 confines errors to the
    second seed half (searchHalfExactImpl); the dense-mutation fixture has
    no exact first half anywhere, so nothing may be found."""
    d = db_and_queries
    out = str(d / "out_hx.m8")
    opt = opt_mod.make_search_options(
        opt_mod.Domain.NUCLEOTIDE,
        query_file=str(d / "q.fasta"), index_file=str(d / "db.lit"),
        output=out, verbosity=0)
    opt.search_opts.max_seed_dist = 2
    opt.iterative_search = False
    opt.adaptive_seeding = False
    opt.seed_half_exact = True
    opt.pre_scoring = 0
    pipeline.run_search(opt)
    rows = [l for l in open(out).read().splitlines()
            if l and not l.startswith("#")]
    assert rows == []
