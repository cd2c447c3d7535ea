"""External correctness anchors: HAND-COMPUTED coordinate expectations.

The golden files lock regressions but are self-generated (the reference
binary is unbuildable here).  These fixtures anchor the trickiest
coordinate semantics to values derived BY HAND from the BLAST
conventions the reference implements:

* blastx negative-frame untranslation of query coordinates
  (search_output.hpp:86-109 _untranslateSequence; m8 qstart > qend on
  the minus strand; 1-based inclusive DNA coords)
* tblastn subject-coordinate untranslation (subject is DNA)
* SAM soft-clip CIGAR in DNA space for a translated query
  (blastMatchOneCigar, search_output.hpp:116-177)

Each test constructs an exact-match case whose coordinates are computed
from first principles in the comments, NOT by running the framework.
"""

import re

import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import run_cli, rev_translate, revcomp

# 10-aa peptide with distinct residues; rev_translate gives one codon
# per residue (30 nt)
PEP = "MKLVNNWFAD"
DECOY = "GHIRSTEEQCPYGHIRSTEEQCPY"


def _m8_rows(path):
    rows = []
    for line in open(path):
        if line.strip() and not line.startswith("#"):
            rows.append(line.rstrip("\n").split("\t"))
    return rows


@pytest.fixture(scope="module")
def pdb(tmp_path_factory):
    d = tmp_path_factory.mktemp("anchors")
    db = d / "pdb.fasta"
    # subject long enough to pass the default e-value with a 10aa match:
    # embed PEP inside a longer subject at a KNOWN offset (sstart anchor)
    subj = DECOY + PEP + DECOY            # PEP at protein pos 25..34 (1-based)
    fasta.write_fasta(db, [fasta.SeqRecord("SUBJ", subj.encode())])
    lit = d / "pdb.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    return d, lit


def test_blastx_minus_frame_untranslation(pdb):
    """Query = revcomp(codons(PEP)), 30 nt: the peptide lives on frame
    -1.  Hand computation: protein position p (0-based) of the
    translated minus-frame maps to plus-strand DNA 1-based coordinates
    [L-3p-2, L-3p] with L=30.  Alignment covers p in [0, 10):
      qstart = L - 3*0     = 30   (first base read, minus orientation)
      qend   = L - 3*10 + 1 = 1
    BLAST m8 reports qstart > qend for minus-strand blastx matches."""
    d, lit = pdb
    dna = revcomp(rev_translate(PEP))
    assert len(dna) == 30
    q = d / "qx.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("qminus", dna.encode())])
    out = d / "qx.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-e", "1000", "--seed-length", "8", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = [rw for rw in _m8_rows(out) if rw[0] == "qminus"]
    assert rows, "no match found"
    best = rows[0]
    # qstart, qend, sstart, send are columns 7-10 (1-based BLAST m8)
    assert (best[6], best[7]) == ("30", "1"), best
    assert (best[8], best[9]) == ("25", "34"), best
    assert float(best[2]) == 100.0


def test_blastx_plus_frame_offset_untranslation(pdb):
    """Query = 'GG' + codons(PEP) + 'A', 33 nt: the peptide lives on
    frame +3 (0-based offset 2).  Protein position p maps to 1-based DNA
    [3p + 3, 3p + 5] (offset 2 + 1).  Alignment covers p in [0, 10):
      qstart = 0*3 + 2 + 1 = 3
      qend   = 9*3 + 2 + 3 = 32
    """
    d, lit = pdb
    dna = "GG" + rev_translate(PEP) + "A"
    q = d / "qp.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("qplus", dna.encode())])
    out = d / "qp.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-e", "1000", "--seed-length", "8", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = [rw for rw in _m8_rows(out) if rw[0] == "qplus"]
    assert rows, "no match found"
    best = rows[0]
    assert (best[6], best[7]) == ("3", "32"), best
    assert (best[8], best[9]) == ("25", "34"), best


def test_tblastn_subject_untranslation(tmp_path):
    """Protein query vs DNA db (tblastn): subject coords untranslate to
    DNA.  Subject DNA = 'GG' + codons(DECOY + PEP) + 'AA': the protein
    frame +3 contains DECOY+PEP; PEP occupies protein positions 24..33
    (0-based), i.e. DNA 1-based [3*24+3, 3*33+5] = [75, 104]."""
    dna = "GG" + rev_translate(DECOY + PEP) + "AA"
    db = tmp_path / "ndb.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("DNASUBJ", dna.encode())])
    lit = tmp_path / "ndb.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    q = tmp_path / "qprot.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("qpep", PEP.encode())])
    out = tmp_path / "t.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-e", "1000", "--seed-length", "8", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = [rw for rw in _m8_rows(out) if rw[0] == "qpep"]
    assert rows, "no match found"
    best = rows[0]
    assert (best[6], best[7]) == ("1", "10"), best
    assert (best[8], best[9]) == ("75", "104"), best


def test_blastx_sam_softclip_cigar(pdb):
    """SAM one-CIGAR for a translated (blastx) query is written in DNA
    space with soft clips for the unaligned query (blastMatchOneCigar,
    search_output.hpp:146-194).  Query 'GGG' + codons(PEP) + 'TTT'
    (36 nt): the 3-nt flank keeps the peptide on a codon boundary, so
    frame +1 translates to 'G' + PEP + ...; the alignment covers
    protein positions 1..11 of that frame.  Hand computation: protein
    position p maps to DNA 1-based [3p+1, 3p+3]: qstart = 4, qend = 33;
    unaligned DNA = 3 nt front + 3 nt back -> CIGAR '3S30M3S'."""
    d, lit = pdb
    dna = "GGG" + rev_translate(PEP) + "TTT"
    q = d / "qs.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("qsam", dna.encode())])
    # default --sam-bam-clip hard (search_options.hpp:364) -> H clips;
    # soft mode -> S clips (frame clips would stay H; frame +1 has none)
    for mode, cig in (("hard", "3H30M3H"), ("soft", "3S30M3S")):
        out = d / f"qs_{mode}.sam"
        r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                    "-e", "1000", "--seed-length", "8",
                    "--sam-bam-clip", mode, "-v", "0")
        assert r.returncode == 0, r.stderr
        lines = [ln for ln in open(out) if not ln.startswith("@")
                 and ln.split("\t")[0] == "qsam"]
        assert lines, "no SAM record"
        f = lines[0].rstrip("\n").split("\t")
        assert f[5] == cig, (mode, f[5])
        # POS: subject-space start (protein subject; PEP starts at 25)
        assert f[3] == "25", f[3]


def test_tblastx_dual_frame_untranslation(tmp_path):
    """tblastx (DNA query vs translated-DNA db): BOTH coordinate pairs
    untranslate to DNA, each mirrored when its frame is negative.

    Subjects (hand computation in 1-based plus-strand coords):
    * SPLUS = 'GG' + codons(DECOY+PEP) + 'AA': PEP at protein positions
      24..33 of subject frame +3 -> DNA [3p+3, 3p+5] -> sstart 75,
      send 104 (ascending).
    * SMINUS = 'GGGG' + revcomp(codons(PEP)) + 'AA', L=36: on the
      reverse strand ('TT' + codons(PEP) + 'CCCC') PEP starts at rc
      offset 2 (a -frame).  rc nt position r maps to plus-strand L-r
      (1-based), so protein p occupies [L-(2+3p+2), L-(2+3p)]:
      sstart = 36-2 = 34 (first base read), send = 36-2-29 = 5
      (descending).
    Queries:
    * QPLUS  = codons(PEP), frame +1: qstart 1, qend 30.
    * QMINUS = revcomp(codons(PEP)), frame -1: qstart 30, qend 1
      (same arithmetic as the blastx minus anchor above).
    """
    db = tmp_path / "xdb.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("SPLUS",
                        ("GG" + rev_translate(DECOY + PEP) + "AA").encode()),
        fasta.SeqRecord("SMINUS",
                        ("GGGG" + revcomp(rev_translate(PEP)) + "AA").encode()),
    ])
    lit = tmp_path / "xdb.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    q = tmp_path / "xq.fasta"
    fasta.write_fasta(q, [
        fasta.SeqRecord("QPLUS", rev_translate(PEP).encode()),
        fasta.SeqRecord("QMINUS", revcomp(rev_translate(PEP)).encode()),
    ])
    out = tmp_path / "x.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-e", "1000", "--seed-length", "8",
                "--output-columns", "std qframe sframe", "-v", "0")
    assert r.returncode == 0, r.stderr
    pairs = {}
    for rw in _m8_rows(out):
        pairs.setdefault((rw[0], rw[1]), rw)   # best line per pair
    for qid in ("QPLUS", "QMINUS"):
        for sid in ("SPLUS", "SMINUS"):
            assert (qid, sid) in pairs, (qid, sid, sorted(pairs))
    qc = {"QPLUS": ("1", "30"), "QMINUS": ("30", "1")}
    sc = {"SPLUS": ("75", "104"), "SMINUS": ("34", "5")}
    for (qid, sid), rw in pairs.items():
        assert (rw[6], rw[7]) == qc[qid], (qid, sid, rw)
        assert (rw[8], rw[9]) == sc[sid], (qid, sid, rw)
        # frame sign columns (std + qframe sframe -> cols 13, 14)
        assert rw[12].startswith("-") == (qid == "QMINUS"), rw
        assert rw[13].startswith("-") == (sid == "SMINUS"), rw


def test_blastn_full_line_first_principles(tmp_path):
    """Every column of a simple blastn m8 line computed independently of
    the framework, per the published NCBI conventions:

    * coordinates: query = subject[40:100] -> sstart 41, send 100.
    * raw score: 60 exact matches x (+2) = 120 (blastn defaults
      match/mismatch 2/-3, gaps -5/-2; search_options.hpp:318-321).
    * Karlin-Altschul (blast_stat.c gapped table for 2/-3, gap 5/2):
      lambda=0.625, K=0.41, alpha=0.8, beta=-2.
    * bit score = (lambda*S - ln K)/ln 2.
    * e-value = K * (m-l) * (n-l) * exp(-lambda*S) with the NCBI
      length-adjustment fixed point l = alpha/lambda *
      (ln K + ln((m-l)(n-l))) + beta, re-implemented here.
    """
    import math

    rng = __import__("numpy").random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), 300))
    db = tmp_path / "ndb.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("NSUBJ", genome.encode())])
    lit = tmp_path / "ndb.lit"
    r = run_cli("mkindexn", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    q = tmp_path / "nq.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("NQ", genome[40:100].encode())])
    out = tmp_path / "n.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = [rw for rw in _m8_rows(out) if rw[0] == "NQ"]
    assert rows, "no blastn match"
    best = rows[0]

    lam, K, alpha, beta = 0.625, 0.41, 0.8, -2.0
    S, m, n = 120, 60.0, 300.0
    bit = (lam * S - math.log(K)) / math.log(2.0)
    ell = 0.0
    for _ in range(20):
        ell = alpha / lam * (math.log(K) + math.log((m - ell) * (n - ell))) \
            + beta
    ell = float(int(ell))      # NCBI floors the converged adjustment
    evalue = K * (m - ell) * (n - ell) * math.exp(-lam * S)

    from lambda_tpu.output.blast_tab import format_bitscore, format_evalue
    assert best[1] == "NSUBJ"
    assert best[2] == "100.00"
    assert best[3:6] == ["60", "0", "0"], best      # length mm gaps
    assert best[6:10] == ["1", "60", "41", "100"], best
    assert best[11] == format_bitscore(bit), (best[11], bit)
    # the m8 field carries ~1 significant digit; the exact check is the
    # formatted-string equality below, the log bound only catches
    # order-of-magnitude drift
    got_e, want_e = float(best[10]), evalue
    assert abs(math.log(got_e) - math.log(want_e)) < 0.5, (got_e, want_e)
    assert best[10] == format_evalue(evalue), (best[10], evalue)
