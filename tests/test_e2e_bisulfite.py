"""Bisulfite-mode end-to-end tests (searchbs / mkindexbs).

Mirrors the reference's blastn-bs cases: bisulfite-converted reads (C->T
on the forward strand, G->A on the reverse) must align against the
unconverted genome with full identity under the BS matrices
(bisulfite_scoring.hpp, view_reduce_to_bisulfite.hpp)."""

from pathlib import Path

import numpy as np
import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import run_cli, read_m8, revcomp


@pytest.fixture(scope="module")
def bs_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("bsdb")
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), 400))
    db = d / "genome.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("chr1", genome.encode())])
    lit = d / "genome.lit"
    r = run_cli("mkindexbs", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    return genome, lit


def test_bisulfite_converted_reads(bs_db, tmp_path):
    genome, lit = bs_db
    # fwd-strand read, fully bisulfite converted: every C -> T
    read_fwd = genome[100:180].replace("C", "T")
    # reverse-strand read: G -> A conversion on the plus strand, then revcomp
    read_rev = revcomp(genome[200:280].replace("G", "A"))
    q = tmp_path / "reads.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("r_fwd", read_fwd.encode()),
                          fasta.SeqRecord("r_rev", read_rev.encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchbs", "-q", str(q), "-i", str(lit), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    by_q = {row[0]: row for row in read_m8(out)}
    # C->T conversions count as matches under the BS fwd matrix
    assert "r_fwd" in by_q, by_q
    assert by_q["r_fwd"][2] == "100.00"
    assert by_q["r_fwd"][6:10] == ["1", "80", "101", "180"]
    assert "r_rev" in by_q, by_q
    assert by_q["r_rev"][2] == "100.00"
    assert by_q["r_rev"][8:10] == ["201", "280"]
    # minus-strand query: the full-length 80nt read mirrors to
    # qstart = L - 0 = 80, qend = L - 79 = 1 (hand-computed anchor,
    # same L-r arithmetic as the blastx/tblastx minus frames)
    assert by_q["r_rev"][6:8] == ["80", "1"]


def test_bisulfite_unconverted_still_hits(bs_db, tmp_path):
    genome, lit = bs_db
    q = tmp_path / "reads.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("plain", genome[50:130].encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchbs", "-q", str(q), "-i", str(lit), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][2] == "100.00"


def test_bisulfite_seed_delta2_pigeonhole(bs_db, tmp_path):
    """delta >= 2 pigeonhole verification must use the per-frame-parity BS
    reduction tables (fwd for even subject frames, rev for odd)."""
    genome, lit = bs_db
    # converted read with extra dense mutations (2+ per 17-mer window)
    read = list(genome[100:180].replace("C", "T"))
    swap = {"A": "G", "G": "T", "T": "A"}
    for p in range(4, len(read), 8):
        read[p] = swap.get(read[p], "A")
    q = tmp_path / "reads.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("noisy", "".join(read).encode())])
    out = tmp_path / "out_d2.m8"
    r = run_cli("searchbs", "-q", str(q), "-i", str(lit), "-o", str(out),
                "--seed-delta", "2", "--search0", "OFF",
                "--adaptive-seeding", "0", "--pre-scoring", "0",
                "--seed-half-exact", "0",
                "-e", "1e-2", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows, "BS pigeonhole seeding found nothing"
    assert rows[0][1] == "chr1"
    assert 95 <= int(rows[0][8]) <= 105


def test_bisulfite_xdrop_backend_parity(bs_db, tmp_path):
    """X-drop with the BISULFITE reverse matrix: odd subject frames
    select subst_rev in every pass-1 backend, and the chunk-granular
    X-drop must compose with that selection identically (native host
    kernel vs pure-XLA fallback) — byte-identical m8 output."""
    genome, lit = bs_db
    read_fwd = genome[100:180].replace("C", "T")
    read_rev = revcomp(genome[200:280].replace("G", "A"))
    q = tmp_path / "reads.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("r_fwd", read_fwd.encode()),
                          fasta.SeqRecord("r_rev", read_rev.encode())])
    outs = []
    for tag, env in (("nat", {"LAMBDA_SW_KERNEL": "native"}),
                     ("xla", {"LAMBDA_SW_KERNEL": "xla",
                              "LAMBDA_NO_NATIVE": "1"})):
        out = tmp_path / f"out_{tag}.m8"
        r = run_cli("searchbs", "-q", str(q), "-i", str(lit),
                    "-o", str(out), "-v", "0",
                    extra_env={**env, "LAMBDA_SW_XDROP": "20"})
        assert r.returncode == 0, r.stderr
        data = out.read_bytes()
        assert data.strip(), f"{tag}: empty output"
        outs.append(data)
    assert outs[0] == outs[1]
