"""End-to-end CLI golden-style tests, mirroring the reference's test
strategy (test/cli/search_test.cpp): build an index, search, inspect the
BLAST-tab output."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lambda_tpu import alphabets as ab
from lambda_tpu.io import fasta

REPO = Path(__file__).resolve().parent.parent

GYRA = (
    "MSDLAREITPVNIEEELKSSYLDYAMSVIVGRALPDVRDGLKPVHRRVLYAMNVLGNDWNKAYKKSARVVGDVIGKYHPHGDSAVYDTIVRMAQPFSLRYMLVDGQGNFGSIDGDSAAAMRYTEIRLAKIAHELMADLEKETVDFVDNYDGTEKIPDVMPTKIPNLLVNGSSGIAVGMATNIPPHNLTEVINGCLAYIDDEDISIEGLMEHIPGPDFPTAAIINGRRGIEEAYRTGRGKVYIRARAEVEVDAKTGRETIIVHEIPYQVNKARLIEKIAELVKEKRVEGISALRDESDKDGMRIVIEVKRDAVGEVVLNNLYSQTQLQVSFGINMVALHHGQPKIMNLKDIIAAFVRHRREVVTRRTIFELRKARDRAHILEALAVALANIDPIIELIRHAPTPAEAKTALVANPWQLGNVAAMLERAGDDAARPEWLEPEFGVRDGLYYLTEQQAQAILDLRLQKLTGLEHEKLLDEYKELLDQIAELLRILGSADRLMEVIREELELVREQFGDKRRTEITAN"
)

# reverse-translate a protein using fixed codons (for blastx/tblastn inputs)
_CODON_OF = {}
for _i in range(64):
    _aa = ab.decode(ab.CODON_TABLE_STD[_i : _i + 1], ab.AMINO_ACID)
    _codon = ab.decode(
        np.array([_i // 16, (_i // 4) % 4, _i % 4], dtype=np.uint8), ab.DNA4)
    _CODON_OF.setdefault(_aa, _codon)


def rev_translate(prot: str) -> str:
    return "".join(_CODON_OF[c] for c in prot)


def revcomp(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def run_cli(*args, extra_env=None) -> subprocess.CompletedProcess:
    env = {"PYTHONPATH": str(REPO), "JAX_PLATFORM_NAME": "cpu",
           "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root",
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "lambda_tpu.cli", *args],
        capture_output=True, text=True, cwd=REPO, env=env,
        check=False)


def read_m8(path):
    rows = []
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        rows.append(line.split("\t"))
    return rows


@pytest.fixture(scope="module")
def protein_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdb")
    db = d / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("GYRA_ECOLI gyrase", GYRA.encode()),
        fasta.SeqRecord("OTHER_PROT", b"MNKQRSTVWYACDEFGHILMNPQRSTVWYACDEFGHIKLM" * 4),
    ])
    out = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    return out


@pytest.fixture(scope="module")
def dna_db(tmp_path_factory):
    """DNA database indexed for protein search (6-frame, for tblastn/x)."""
    d = tmp_path_factory.mktemp("ndb")
    db = d / "db.fasta"
    dna = rev_translate(GYRA[:160])
    fasta.write_fasta(db, [fasta.SeqRecord("GYRA_DNA", dna.encode())])
    out = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    return out


def test_blastp_exact_and_mismatch(protein_db, tmp_path):
    q = tmp_path / "q.fasta"
    frag = GYRA[50:130]
    frag2 = GYRA[200:280]
    frag2 = frag2[:30] + "AG" + frag2[32:]
    fasta.write_fasta(q, [fasta.SeqRecord("q1", frag.encode()),
                          fasta.SeqRecord("q2", frag2.encode()),
                          fasta.SeqRecord("qnone", b"MWCHPMWCHPMWCHPMWCHP")])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    by_q = {r[0]: r for r in rows}
    assert by_q["q1"][1] == "GYRA_ECOLI"
    assert by_q["q1"][2] == "100.00"
    assert by_q["q1"][6:10] == ["1", "80", "51", "130"]
    assert by_q["q2"][2] == "97.50"
    assert by_q["q2"][6:10] == ["1", "80", "201", "280"]
    assert "qnone" not in by_q


def test_blastn_plus_minus_strand(tmp_path):
    rng = np.random.default_rng(5)
    s1 = "".join(rng.choice(list("ACGT"), 300))
    s2 = "".join(rng.choice(list("ACGT"), 200))
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("subj1", s1.encode()),
                           fasta.SeqRecord("subj2", s2.encode())])
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexn", "-d", str(db), "-i", str(lit), "-v", "0").returncode == 0

    q1 = s1[100:160]
    rc = revcomp(s2[50:100])
    rc = rc[:20] + ("A" if rc[20] != "A" else "C") + rc[21:]
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", q1.encode()),
                          fasta.SeqRecord("q2", rc.encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    by_q = {r[0]: r for r in read_m8(out)}
    assert by_q["q1"][2] == "100.00"
    assert by_q["q1"][6:10] == ["1", "60", "101", "160"]
    # minus strand: qstart > qend, subject coordinates ascending
    assert by_q["q2"][2] == "98.00"
    assert by_q["q2"][6:10] == ["50", "1", "51", "100"]


def test_blastx_dna_query_against_protein_db(protein_db, tmp_path):
    prot_frag = GYRA[30:90]
    dna = "GG" + rev_translate(prot_frag) + "C"  # frame +3
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("xq1", dna.encode()),
                          fasta.SeqRecord("xq2", revcomp(dna).encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db), "-o", str(out),
                "--output-columns", "std qframe", "-v", "0")
    assert r.returncode == 0, r.stderr
    by_q = {r[0]: r for r in read_m8(out)}
    assert by_q["xq1"][2] == "100.00"
    assert by_q["xq1"][12] == "3"       # query frame +3
    # subject (protein) coordinates 31..90
    assert by_q["xq1"][8:10] == ["31", "90"]
    # dna coords: frame +3 starting at codon 0 -> 1-based 3..182
    assert by_q["xq1"][6:8] == ["3", "182"]
    # reverse query: negative frame, mirrored coordinates
    assert by_q["xq2"][12].startswith("-")
    assert int(by_q["xq2"][6]) > int(by_q["xq2"][7])


def test_tblastn_protein_query_against_dna_db(dna_db, tmp_path):
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("tq1", GYRA[20:100].encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(dna_db), "-o", str(out),
                "--output-columns", "std sframe", "-v", "0")
    assert r.returncode == 0, r.stderr
    by_q = {r[0]: r for r in read_m8(out)}
    assert by_q["tq1"][2] == "100.00"
    assert by_q["tq1"][12] == "1"  # subject frame +1
    assert by_q["tq1"][6:8] == ["1", "80"]
    # subject dna coords: protein 20..100 -> dna 61..300
    assert by_q["tq1"][8:10] == ["61", "300"]


def test_tblastx_dna_query_against_dna_db(dna_db, tmp_path):
    q = tmp_path / "q.fasta"
    dna = rev_translate(GYRA[40:100])
    fasta.write_fasta(q, [fasta.SeqRecord("xxq1", dna.encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(dna_db), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows, "tblastx found no hits"
    assert rows[0][0] == "xxq1"
    assert rows[0][2] == "100.00"


def test_m9_output_with_comments(protein_db, tmp_path):
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    out = tmp_path / "out.m9"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db), "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    text = Path(out).read_text()
    assert "# BLASTP 2.2.26+" in text
    assert "# Query: q1" in text
    assert "# Fields: query id, subject id, % identity" in text
    assert "# 1 hits found" in text
    assert "# BLAST processed 1 queries" in text


def test_num_matches_cutoff_and_evalue(tmp_path):
    # db with many copies of the same repeat: a query should hit all of
    # them, -n limits output
    rng = np.random.default_rng(9)
    core = "".join(rng.choice(list("ACGT"), 80))
    recs = []
    for i in range(6):
        pad = "".join(rng.choice(list("ACGT"), 30))
        recs.append(fasta.SeqRecord(f"s{i}", (pad + core).encode()))
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, recs)
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexn", "-d", str(db), "-i", str(lit), "-v", "0").returncode == 0
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", core.encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-n", "3", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert len(rows) == 3
    # strict e-value: nothing passes
    out2 = tmp_path / "out2.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out2),
                "-e", "1e-60", "-v", "0")
    assert r.returncode == 0, r.stderr
    assert read_m8(out2) == []


def test_lazy_query_streaming_matches_eager(protein_db, tmp_path):
    """--lazy-query (async producer-thread streaming) must produce output
    identical to the eager path (reference test: search_test.cpp:772-777)."""
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [
        fasta.SeqRecord(f"q{i}", GYRA[i * 7 : i * 7 + 60].encode())
        for i in range(20)])
    eager = tmp_path / "eager.m8"
    lazy = tmp_path / "lazy.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(eager), "-v", "0")
    assert r.returncode == 0, r.stderr
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(lazy), "--lazy-query", "-v", "0")
    assert r.returncode == 0, r.stderr
    assert Path(eager).read_text() == Path(lazy).read_text()
    assert read_m8(eager)


def test_friendly_error_messages(tmp_path):
    """Top-level exception handling mirrors the reference
    (search.cpp:98-125): typed messages, exit code 1, no traceback."""
    r = run_cli("searchp", "-q", "/nonexistent.fa", "-i", "/nonexistent.lit",
                "-o", str(tmp_path / "x.m8"))
    assert r.returncode == 1
    assert "ERROR" in r.stderr and "Traceback" not in r.stderr
    assert "query" in r.stderr
    q = tmp_path / "q.fasta"
    q.write_text(">q1\nMKV\n")
    r = run_cli("searchp", "-q", str(q), "-i", "/nonexistent.lit",
                "-o", str(tmp_path / "x.m8"))
    assert r.returncode == 1 and "index" in r.stderr


def test_gz_outputs(protein_db, tmp_path):
    """.m8.gz / .m9.gz outputs (search_test.cpp gz cases)."""
    import gzip as _gzip

    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    plain = tmp_path / "out.m8"
    gz = tmp_path / "out.m8.gz"
    assert run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                   "-o", str(plain), "-v", "0").returncode == 0
    assert run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                   "-o", str(gz), "-v", "0").returncode == 0
    assert _gzip.open(gz, "rt").read() == Path(plain).read_text()


def test_gz_query_input(protein_db, tmp_path):
    import gzip as _gzip

    q = tmp_path / "q.fasta.gz"
    with _gzip.open(q, "wt") as fh:
        fh.write(f">q1\n{GYRA[50:130]}\n")
    out = tmp_path / "out.m8"
    assert run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                   "-o", str(out), "-v", "0").returncode == 0
    assert read_m8(out)


@pytest.mark.parametrize("profile", ["fast", "sensitive", "pairs-default",
                                     "pairs-sensitive"])
def test_profiles_run_and_find_hits(profile, protein_db, tmp_path):
    """Profiles are flag bundles overriding seeds/prescore
    (search_options.hpp:631-682); all must find the exact fragment."""
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    out = tmp_path / f"out_{profile}.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(out), "-p", profile, "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][1].startswith("GYRA")
    assert float(rows[0][2]) == 100.0


def test_blastn_with_N_bases(tmp_path):
    """dna5 inputs: 'N' maps to fixed-seed pseudo-random ACGT in the index
    (view_dna_n_to_random.hpp) and in query frames; alignment still found."""
    rng = np.random.default_rng(31)
    s1 = list("".join(rng.choice(list("ACGT"), 400)))
    for p in (50, 150, 250, 350):
        s1[p] = "N"
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("subjN", "".join(s1).encode())])
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexn", "-d", str(db), "-i", str(lit),
                   "-v", "0").returncode == 0
    # query with its own N's
    q_seq = list("".join(s1[100:170]))
    q_seq[30] = "N"
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("qN", "".join(q_seq).encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][1] == "subjN"
    assert int(rows[0][8]) == 101 and int(rows[0][9]) == 170


def test_murphy10_reduction_index(tmp_path):
    """mkindexp -r murphy10: seeding in the Murphy 10-letter alphabet,
    alignment still in aa27 (BASELINE config 3)."""
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("GYRA_ECOLI", GYRA.encode())])
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexp", "-d", str(db), "-i", str(lit),
                   "-r", "murphy10", "-v", "0").returncode == 0
    q = tmp_path / "q.fasta"
    # distant homolog-ish: mutate within murphy classes would stay seedable;
    # use a plain fragment with scattered mutations
    frag = list(GYRA[100:180])
    frag[10], frag[40], frag[70] = "A", "G", "S"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", "".join(frag).encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][1] == "GYRA_ECOLI"
    assert int(rows[0][8]) == 101 and int(rows[0][9]) == 180


def test_overflow_retry_budget_doubling(tmp_path, monkeypatch):
    """When the fixed hit budget overflows, the batch reruns with doubled
    budgets instead of silently truncating (reference allocates freely)."""
    import lambda_tpu.options as om
    from lambda_tpu.search import pipeline
    from lambda_tpu.stats import StatsHolder
    from lambda_tpu import alphabets as ab
    from lambda_tpu.index import artifact

    rng = np.random.default_rng(2)
    # highly repetitive database: every seed hits everywhere.  (Letters
    # outside the IUPAC dna15 set so auto-detection reads them as protein,
    # exactly like the reference's detectSeqFileAlphabet.)
    unit = "".join(rng.choice(list("EFIL"), 16))
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord(f"s{i}", (unit * 30).encode())
                           for i in range(8)])
    iopts = om.IndexerOptions(domain=om.Domain.PROTEIN, db_file=str(db),
                              index_file=str(tmp_path / "db.lit"))
    artifact.save_index(artifact.build_index(iopts),
                        str(tmp_path / "db.lit"))
    opt = om.make_search_options(
        om.Domain.PROTEIN, query_file=str(db),
        index_file=str(tmp_path / "db.lit"),
        output=str(tmp_path / "o.m8"), verbosity=0)
    opt.iterative_search = False
    opt.adaptive_seeding = False
    opt.max_hits_per_query_frame = 8   # tiny budget: must overflow
    ctx = pipeline.SearchContext(opt)
    qs = [ab.encode((unit * 10).encode(), ctx.qry_orig_alph)]
    st = StatsHolder()
    res = ctx.process_batch(qs, opt.search_opts, st)
    assert res, "no hits found"
    # the scaled seeder (scale>1) must have been created
    assert any(k[3] > 1 for k in ctx._seeders), ctx._seeders.keys()


def test_iupac_dna_query_detected_as_dna(protein_db, tmp_path):
    """IUPAC-ambiguity DNA (detectSeqFileAlphabet semantics) must be
    detected as DNA, not protein: searchp runs BLASTX on it."""
    dna = rev_translate(GYRA[30:90])
    dna = dna[:20] + "RYSWKM" + dna[26:]   # ambiguity codes act like N
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("iupac_q", dna.encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(out), "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][1].startswith("GYRA")


def test_bz2_output(protein_db, tmp_path):
    import bz2 as _bz2

    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    plain = tmp_path / "o.m8"
    bz = tmp_path / "o.m8.bz2"
    assert run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                   "-o", str(plain), "-v", "0").returncode == 0
    assert run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                   "-o", str(bz), "-v", "0").returncode == 0
    assert _bz2.open(bz, "rt").read() == Path(plain).read_text()


def test_long_query_no_cliff(tmp_path):
    """Long queries (multi-thousand nt) stay on the banded path — the
    round-1 rectangle kernel had an M_MAX=16384 device cliff; the banded
    kernel's window cost is O(qlen * band), so there is no length
    fallback left.  blastn with a 20 kb query against a 30 kb subject."""
    rng = np.random.default_rng(123)
    genome = "".join(rng.choice(list("ACGT"), 30000))
    db = tmp_path / "g.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("chr", genome.encode())])
    lit = tmp_path / "g.lit"
    assert run_cli("mkindexn", "-d", str(db), "-i", str(lit),
                   "-v", "0").returncode == 0
    # query = 20 kb slice with scattered mutations
    frag = list(genome[5000:25000])
    for _ in range(200):
        frag[rng.integers(0, len(frag))] = rng.choice(list("ACGT"))
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("long_q", "".join(frag).encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchn", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows, "no hits for the long query"
    best = max(rows, key=lambda r: int(r[3]))
    # the dominant hit must span (nearly) the whole query
    assert int(best[3]) > 19000, best
    assert float(best[2]) > 98.0, best


def test_edge_inputs_empty_tiny_alln(protein_db, tmp_path):
    """Degenerate query inputs: an empty query file gets the friendly
    typed error (the reference's QueryException path); a query shorter
    than the seed and an all-X query (every seed start masked) run
    cleanly and produce empty, well-formed outputs."""
    q = tmp_path / "empty.fasta"
    q.write_text("")
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(tmp_path / "empty.m8"), "-v", "0")
    assert r.returncode != 0
    assert "query" in r.stderr.lower() and "empty" in r.stderr.lower()

    for name, content in {"tiny": ">t\nMK\n",
                          "allx": ">x\n" + "X" * 40 + "\n"}.items():
        q = tmp_path / f"{name}.fasta"
        q.write_text(content)
        out = tmp_path / f"{name}.m8"
        r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                    "-o", str(out), "-v", "0")
        assert r.returncode == 0, (name, r.stderr)
        assert out.read_text() == "", name


def test_query_batch_size_invariance_iterative(tmp_path):
    """Output bytes must not depend on --query-batch (CLAUDE.md
    determinism contract) INCLUDING in iterative mode: phase-1 winners
    are buffered until the batch's phase-2 survivors are in, then
    everything is written in query order — eager phase-1 writes would
    interleave differently per batch size."""
    from lambda_tpu.io import fasta

    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("GYRA_ECOLI", GYRA.encode())])
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexp", "-d", str(db), "-i", str(lit),
                   "-v", "0").returncode == 0

    # alternate phase-1 winners (exact fragments) with phase-2-only
    # queries (a disruptive substitution every 8 residues: no exact
    # reduced 10-mer for phase 1; phase 2's delta-1 11-mers still hit)
    recs = []
    for i in range(6):
        frag = list(GYRA[40 * i:40 * i + 96])
        if i % 2:
            for p in range(0, 96, 8):
                frag[p] = "W" if frag[p] != "W" else "P"
        recs.append(fasta.SeqRecord(f"q{i}", "".join(frag).encode()))
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, recs)

    outs = {}
    for bs in (2, 6):
        out = tmp_path / f"bs{bs}.m8"
        r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o",
                    str(out), "-v", "0", "--query-batch", str(bs))
        assert r.returncode == 0, r.stderr
        outs[bs] = out.read_text()
    assert outs[2] == outs[6]
    # the scenario is real: both query classes produce output
    assert "q0\t" in outs[2] and "q1\t" in outs[2]


def test_output_columns_help_exits_zero(protein_db, tmp_path):
    """-oc help prints the supported column list and exits 0 WITHOUT
    running a search (search_options.hpp:713-729)."""
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(tmp_path / "x.m8"), "--output-columns", "help")
    assert r.returncode == 0, r.stderr
    assert "the following are supported" in r.stdout
    for label in ("std", "qseqid", "staxids", "lcataxid", "bitscore"):
        assert f"\t{label}" in r.stdout, label
    assert not (tmp_path / "x.m8").exists()


def test_sam_bam_tags_help_and_unknown_tag(protein_db, tmp_path):
    """--sam-bam-tags 'help' prints the tag list and exits 0; an unknown
    tag errors instead of being silently dropped
    (search_options.hpp:774-808)."""
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    out = tmp_path / "x.sam"
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(out), "--sam-bam-tags", "help")
    assert r.returncode == 0, r.stderr
    assert "The following specifiers are supported" in r.stdout
    for tag in ("AS", "NM", "ar", "lt"):
        assert f"\t{tag}\t" in r.stdout, tag
    assert not out.exists()
    r = run_cli("searchp", "-q", str(q), "-i", str(protein_db),
                "-o", str(out), "--sam-bam-tags", "AS BOGUS")
    assert r.returncode != 0
    assert 'Unknown column specifier "BOGUS"' in r.stderr
