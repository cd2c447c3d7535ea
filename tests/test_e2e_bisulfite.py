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


def test_bisulfite_m8_randomized_mismatch_consistency(bs_db, tmp_path):
    """Randomized coordinate/mismatch consistency: for gapless m8 lines,
    re-count mismatches from the genome and read segments under the two
    BS rules (fwd: subject C ≡ query T; rev: subject G ≡ query A, after
    re-orienting minus-strand reads) — the asymmetric-match analogue of
    the blastx untranslation checks.  The subject FRAME parity (not the
    query strand) picks the rule and is not an m8 column, and a read
    can legitimately hit both duplicate frames — so each line must be
    explained by one of the two rule counts, and the strand-canonical
    rule must explain the best line per read.  Pins
    evaluate_bisulfite_alignment.hpp:26-119 semantics on random
    partially-converted noisy reads."""
    genome, lit = bs_db
    rng = np.random.default_rng(47)
    reads = []
    for i in range(10):
        st = int(rng.integers(0, 310))
        frag = list(genome[st:st + 80])
        minus = rng.random() < 0.5
        conv_from, conv_to = ("G", "A") if minus else ("C", "T")
        for p, c in enumerate(frag):
            if c == conv_from and rng.random() < 0.7:   # partial conversion
                frag[p] = conv_to
        for _ in range(int(rng.integers(0, 4))):        # real mutations
            p = int(rng.integers(0, len(frag)))
            frag[p] = rng.choice(list("ACGT"))
        s = "".join(frag)
        if minus:
            s = revcomp(s)
        reads.append(fasta.SeqRecord(f"r{i}", s.encode()))
    q = tmp_path / "reads.fasta"
    fasta.write_fasta(q, reads)
    rmap = {r.id.split()[0]: r.seq.decode() for r in reads}
    out = tmp_path / "out.m8"
    r = run_cli("searchbs", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert len(rows) >= 8
    n_minus = 0
    best_rule_ok = {}
    for row in rows:
        (qid, sid, pident, length, mism, gapo, qs, qe, ss, se,
         *_) = row
        if int(gapo):
            continue
        qs, qe, ss, se = int(qs), int(qe), int(ss), int(se)
        L = int(length)
        assert ss <= se, row
        sseg = genome[ss - 1:se]
        read = rmap[qid]
        if qs <= qe:
            qseg = read[qs - 1:qe]
            canonical = "fwd"
        else:
            qseg = revcomp(read[qe - 1:qs])
            canonical = "rev"
            n_minus += 1
        assert len(qseg) == L and len(sseg) == L, row
        fwd = sum(not (q == s or (s == "C" and q == "T"))
                  for s, q in zip(sseg, qseg))
        rev = sum(not (q == s or (s == "G" and q == "A"))
                  for s, q in zip(sseg, qseg))
        assert int(mism) in (fwd, rev), (qid, sseg, qseg, fwd, rev, mism)
        if qid not in best_rule_ok:
            # the FIRST (best) line per read must match its
            # strand-canonical rule: converted reads align cleanly only
            # under it
            want = fwd if canonical == "fwd" else rev
            best_rule_ok[qid] = int(mism) == want
    assert n_minus, "fixture must produce minus-strand BS lines"
    assert all(best_rule_ok.values()), best_rule_ok
