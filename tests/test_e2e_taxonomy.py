"""End-to-end taxonomy: acc-tax-map + tax dump at index time, staxids /
lca columns at search time (C12/C13/C22 of SURVEY.md)."""

from pathlib import Path

import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import GYRA, run_cli, read_m8


@pytest.fixture(scope="module")
def tax_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("tax")
    db = d / "db.fasta"
    # ids carry UniProt-style accessions (P0AES4, Q9XYZ1)
    fasta.write_fasta(db, [
        fasta.SeqRecord("sp|P0AES4|GYRA_ECOLI gyrase", GYRA.encode()),
        fasta.SeqRecord("sp|P12345|OTHER other protein", GYRA[:200].encode()),
    ])
    # NCBI-style accession2taxid mapping
    acc_map = d / "map.accession2taxid"
    acc_map.write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "P0AES4\tP0AES4.1\t562\t0\n"      # E. coli
        "P12345\tP12345.1\t9606\t0\n")    # human
    # tiny taxonomy: 1=root, 131567=cellular organisms, 2=bacteria,
    # 2759=eukaryota, 562=E.coli, 9606=human
    dump = d / "dump"
    dump.mkdir()
    (dump / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "131567\t|\t1\t|\tno rank\t|\n"
        "2\t|\t131567\t|\tsuperkingdom\t|\n"
        "2759\t|\t131567\t|\tsuperkingdom\t|\n"
        "562\t|\t2\t|\tspecies\t|\n"
        "9606\t|\t2759\t|\tspecies\t|\n")
    (dump / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
        "2759\t|\tEukaryota\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
        "9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|\n")
    lit = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit),
                "-m", str(acc_map), "-x", str(dump), "-v", "0")
    assert r.returncode == 0, r.stderr
    return d, lit


def test_staxids_and_lca_columns(tax_setup):
    d, lit = tax_setup
    q = d / "q.fasta"
    # query hits both subjects -> LCA should walk up to 'cellular organisms'
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:150].encode())])
    out = d / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "--output-columns", "std staxids lcaid lcataxid",
                "-n", "5", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert len(rows) == 2
    staxids = {row[1]: row[12] for row in rows}
    assert staxids["sp|P0AES4|GYRA_ECOLI"] == "562"
    assert staxids["sp|P12345|OTHER"] == "9606"
    # LCA of E.coli and human in the thinned tree
    assert rows[0][13] == "cellular organisms"
    assert rows[0][14] == "131567"


def test_lca_single_subject(tax_setup):
    d, lit = tax_setup
    q = d / "q.fasta2"
    # query only hits the tail of GYRA (not in the 200aa OTHER prefix)
    fasta.write_fasta(q, [fasta.SeqRecord("q2", GYRA[300:400].encode())])
    out = d / "out2.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "--output-columns", "std lcataxid", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows and rows[0][12] == "562"


def test_bz2_map_and_out_of_tree_taxid(tmp_path):
    """bz2-compressed mapping files open transparently (the reference's
    regex accepts .bz2), and a taxid beyond the taxdump's id range (map
    newer than tree) is ignored at LCA time instead of crashing."""
    import bz2

    d = tmp_path
    db = d / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("sp|P0AES4|GYRA_ECOLI gyrase", GYRA.encode()),
        fasta.SeqRecord("sp|P12345|OTHER other protein", GYRA[:200].encode()),
    ])
    acc_map = d / "map.accession2taxid.bz2"
    with bz2.open(acc_map, "wt") as fh:
        fh.write("accession\taccession.version\ttaxid\tgi\n"
                 "P0AES4\tP0AES4.1\t562\t0\n"
                 "P12345\tP12345.1\t999999999\t0\n")  # beyond nodes.dmp
    dump = d / "dump"
    dump.mkdir()
    (dump / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "562\t|\t2\t|\tspecies\t|\n")
    (dump / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n")
    lit = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit),
                "-m", str(acc_map), "-x", str(dump), "-v", "0")
    assert r.returncode == 0, r.stderr
    q = d / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[30:110].encode())])
    out = d / "o.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "--output-columns", "std staxids lcaid lcataxid", "-v", "0")
    assert r.returncode == 0, r.stderr
    rows = read_m8(out)
    assert rows, "expected hits"
    # the out-of-tree subject contributes staxids but never the LCA
    lcaids = {row[13] for row in rows}
    assert "999999999" not in lcaids


def test_lca_random_trees_match_bruteforce(tmp_path):
    """compute_lca on the thinned+flattened tree must equal the LCA in
    the ORIGINAL tree for any two present taxa: the true LCA is either
    an ancestor of the other taxon or a branching node, and both
    survive thinning/flattening (mkindex_algo.hpp:354-598 semantics,
    search_misc.hpp:86-112 walk).  Randomized oracle over random trees
    and random present subsets."""
    import numpy as np

    from lambda_tpu.index import taxonomy

    rng = np.random.default_rng(123)
    for trial in range(12):
        n = int(rng.integers(4, 60))
        # random tree over ids 2..n+1 (1 = root); parent of i < i
        ids = list(range(2, n + 2))
        parent_of = {1: 1}
        for i in ids:
            parent_of[i] = int(rng.choice([1] + [j for j in ids if j < i])) \
                if i > 2 else 1
        dump = tmp_path / f"dump{trial}"
        dump.mkdir()
        (dump / "nodes.dmp").write_text("".join(
            f"{i}\t|\t{p}\t|\tno rank\t|\n" for i, p in parent_of.items()))
        (dump / "names.dmp").write_text("".join(
            f"{i}\t|\ttax{i}\t|\t\t|\tscientific name\t|\n"
            for i in parent_of))
        k = int(rng.integers(2, max(3, n // 2)))
        present = set(int(x) for x in rng.choice(ids, size=k, replace=False))
        parents, heights, names = taxonomy.build_tax_tree(str(dump), present)

        def orig_ancestors(t):
            chain = [t]
            while t != 1:
                t = parent_of[t]
                chain.append(t)
            return chain

        pl = sorted(present)
        for a in pl:
            for b in pl:
                anc = orig_ancestors(a)
                want = next(t for t in orig_ancestors(b) if t in set(anc))
                got = taxonomy.compute_lca(parents, heights, a, b)
                assert got == want, (trial, a, b, got, want, parent_of)
