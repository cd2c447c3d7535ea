import numpy as np
import pytest

from lambda_tpu import alphabets as ab
from lambda_tpu import frames as fr
from lambda_tpu import options as opt_mod
from lambda_tpu.index import build as ib
from lambda_tpu.index import artifact
from lambda_tpu.io import fasta


def test_position_keys_basic():
    # two frames: "ACGT" and "CG"; dna4 alphabet (4 ranks -> 4 bits/char)
    concat = np.array([0, 1, 2, 3, 1, 2], dtype=np.uint8)
    offsets = np.array([0, 4, 6], dtype=np.int64)
    keys = ib.build_position_keys(concat, offsets, bits=4, words=2)
    assert keys.shape == (6, 2)
    # position 0: chars ACGT then sentinel -> nibbles 1,2,3,4,0,0,0,0
    assert keys[0, 0] == 0x12340000
    assert keys[0, 1] == 0
    # position 3 (last of frame0): T then end -> 4,0...
    assert keys[3, 0] == 0x40000000
    # position 4 (frame1 "CG"): 2,3 -> does NOT run into frame0's data
    assert keys[4, 0] == 0x23000000


def test_kmer_index_sorted_and_lookup():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 4, size=n).astype(np.uint8) for n in (50, 33, 70)]
    concat, offsets, _ = fr.concat_frames(seqs)
    idx = ib.build_kmer_index(concat, offsets, alphabet_size=4)
    # sorted lexicographically
    k = idx.keys
    for w in range(idx.words):
        pass
    as_tuples = list(map(tuple, k.tolist()))
    assert as_tuples == sorted(as_tuples)
    # every position present exactly once
    assert sorted(idx.pos.tolist()) == list(range(len(concat)))
    # lookup a known 8-mer by scanning: take the 8-mer at frame1 offset 5
    p = offsets[1] + 5
    pat = concat[p : p + 8]
    # brute-force find all occurrences
    expected = []
    for f in range(3):
        s = concat[offsets[f] : offsets[f + 1]]
        for i in range(len(s) - 7):
            if (s[i : i + 8] == pat).all():
                expected.append(offsets[f] + i)
    # via keys: pack pattern into a prefix and compare masked keys
    bits, cpw = idx.bits, idx.chars_per_word
    target = np.zeros(idx.words, dtype=np.uint64)
    for j, c in enumerate(pat):
        w = j // cpw
        sh = (cpw - 1 - (j % cpw)) * bits
        target[w] |= np.uint64((int(c) + 1) << sh)
    mask = np.zeros(idx.words, dtype=np.uint64)
    for j in range(8):
        w = j // cpw
        sh = (cpw - 1 - (j % cpw)) * bits
        mask[w] |= np.uint64(0xF << sh)
    hits = [idx.pos[i] for i in range(idx.num_positions)
            if all((int(idx.keys[i, w]) & int(mask[w])) == int(target[w])
                   for w in range(idx.words))]
    assert sorted(hits) == sorted(expected)
    assert int(p) in hits


def test_build_and_save_load_roundtrip(tmp_path):
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("s1 first", b"MKVLAAGITKGLDDYYKQW"),
        fasta.SeqRecord("s2", b"ACDEFGHIKLMNPQRSTVWYACDEF"),
    ])
    opts = opt_mod.IndexerOptions(db_file=str(db), domain=opt_mod.Domain.PROTEIN)
    idx = artifact.build_index(opts)
    assert idx.orig_alph == ab.AMINO_ACID
    assert idx.red_alph == ab.LI10  # protein default reduction
    assert idx.num_subjects == 2
    assert idx.sbj_num_frames == 1
    assert idx.db_total_length == 19 + 25

    out = tmp_path / "db.lit"
    artifact.save_index(idx, str(out))
    idx2 = artifact.load_index(str(out))
    # truncate_ids defaults to True (mkindex_options.hpp:45)
    assert idx2.ids == ["s1", "s2"]
    assert (idx2.kmer.keys == idx.kmer.keys).all()
    assert (idx2.kmer.pos == idx.kmer.pos).all()
    assert ab.decode(idx2.seqs[0], ab.AMINO_ACID) == "MKVLAAGITKGLDDYYKQW"
    assert idx2.db_total_length == idx.db_total_length
    # header peek + generation check
    hdr = artifact.read_index_options(str(out))
    assert hdr["red_alph"] == ab.LI10


def test_nucleotide_index_frames(tmp_path):
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("n1", b"ACGTACGTNNACGT")])
    opts = opt_mod.IndexerOptions(db_file=str(db), domain=opt_mod.Domain.NUCLEOTIDE)
    idx = artifact.build_index(opts)
    assert idx.orig_alph == ab.DNA5 and idx.red_alph == ab.DNA4
    assert idx.sbj_num_frames == 1
    # original seq keeps N (rank 4); index positions cover all 14 chars
    assert idx.seqs[0][8] == 4
    assert idx.kmer.num_positions == 14


def test_bisulfite_index_duplicates(tmp_path):
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("b1", b"ACGT")])
    opts = opt_mod.IndexerOptions(db_file=str(db), domain=opt_mod.Domain.BISULFITE)
    idx = artifact.build_index(opts)
    assert idx.sbj_num_frames == 2
    assert idx.kmer.num_positions == 8
    assert idx.kmer.alphabet_size == 6


def test_protein_from_dna_six_frames(tmp_path):
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("d1", b"ATGGCATAAATGGCATAA")])
    opts = opt_mod.IndexerOptions(db_file=str(db), domain=opt_mod.Domain.PROTEIN)
    idx = artifact.build_index(opts)
    assert idx.orig_alph == ab.DNA5
    assert idx.trans_alph == ab.AMINO_ACID
    assert idx.sbj_num_frames == 6
    assert ab.decode(idx.trans_frames[0], ab.AMINO_ACID) == "MA*MA*"


def test_query_frames_nucleotide():
    s = ab.encode("AACGT", ab.DNA5)
    qf = fr.query_trans_frames([s], ab.DNA5, ab.DNA5, ab.DNA4)
    assert len(qf) == 2
    assert ab.decode(qf[0], ab.DNA5) == "AACGT"
    assert ab.decode(qf[1], ab.DNA5) == "ACGTT"


def test_query_frames_bisulfite_order():
    s = ab.encode("ACGT", ab.DNA5)
    qf = fr.query_trans_frames([s], ab.DNA5, ab.DNA5, ab.DNA3BS)
    assert len(qf) == 4
    # fwd, fwd, rc, rc
    assert ab.decode(qf[0], ab.DNA5) == "ACGT"
    assert ab.decode(qf[1], ab.DNA5) == "ACGT"
    assert ab.decode(qf[2], ab.DNA5) == "ACGT"  # revcomp of ACGT is ACGT
    red = fr.reduce_frames(qf, ab.DNA5, ab.DNA3BS)
    # frame0 fwd-reduced: A,C,G,T -> 0,1,2,1 ; frame1 rev-reduced: 3,4,3,5
    assert list(red[0]) == [0, 1, 2, 1]
    assert list(red[1]) == [3, 4, 3, 5]


def test_profiles_match_reference():
    o = opt_mod.make_search_options(opt_mod.Domain.PROTEIN)
    assert o.search_opts.seed_length == 11 and o.search_opts.seed_offset == 3
    assert o.search_opts0.seed_length == 10 and o.search_opts0.max_seed_dist == 0
    o = opt_mod.make_search_options(opt_mod.Domain.PROTEIN, profile="fast")
    assert o.search_opts.seed_length == 10 and o.search_opts.max_seed_dist == 0
    o = opt_mod.make_search_options(opt_mod.Domain.PROTEIN, profile="pairs-sensitive")
    assert o.search_opts.seed_length == 7 and not o.iterative_search
    assert o.pre_scoring == 3 and o.pre_scoring_thresh == 1.9
    o = opt_mod.make_search_options(opt_mod.Domain.NUCLEOTIDE, profile="fast")
    assert not o.iterative_search and o.search_opts.seed_offset == 9
    o = opt_mod.make_search_options(opt_mod.Domain.BISULFITE)
    assert o.max_e_value == 1e-9 and o.search_opts.seed_length == 17


def test_blast_program_table():
    bp = opt_mod.blast_program
    assert bp(ab.DNA5, ab.DNA5, ab.DNA5) == opt_mod.BlastProgram.BLASTN
    assert bp(ab.AMINO_ACID, ab.AMINO_ACID, ab.AMINO_ACID) == opt_mod.BlastProgram.BLASTP
    assert bp(ab.AMINO_ACID, ab.AMINO_ACID, ab.DNA5) == opt_mod.BlastProgram.TBLASTN
    assert bp(ab.AMINO_ACID, ab.DNA5, ab.DNA5) == opt_mod.BlastProgram.TBLASTX
    assert bp(ab.AMINO_ACID, ab.DNA5, ab.AMINO_ACID) == opt_mod.BlastProgram.BLASTX


def test_kmer_words_2_index_and_search(tmp_path):
    """--kmer-words 2 halves key size; search works while seeds fit, and
    over-long seeds get a friendly capacity error."""
    from tests.test_e2e import GYRA, run_cli, read_m8
    from lambda_tpu.io import fasta

    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [fasta.SeqRecord("GYRA_ECOLI", GYRA.encode())])
    lit = tmp_path / "db.lit"
    assert run_cli("mkindexp", "-d", str(db), "-i", str(lit),
                   "--kmer-words", "2", "-v", "0").returncode == 0
    q = tmp_path / "q.fasta"
    fasta.write_fasta(q, [fasta.SeqRecord("q1", GYRA[50:130].encode())])
    out = tmp_path / "out.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "-v", "0")
    assert r.returncode == 0, r.stderr
    assert read_m8(out)[0][1] == "GYRA_ECOLI"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(out),
                "--seed-length", "24", "-v", "0")
    assert r.returncode == 1 and "capacity" in r.stderr


def test_corrupt_artifact_raises_index_exception(tmp_path):
    """Truncations and random bit flips of the artifact must surface as
    IndexException (the friendly re-index message, search_algo.hpp:93-100
    semantics) or — for flips the zip CRC provably tolerates — load data
    identical to the original.  Never a hang, segfault, or raw traceback
    type."""
    import numpy as np

    from lambda_tpu import options as opt_mod
    from lambda_tpu.index import artifact
    from lambda_tpu.io import fasta
    from lambda_tpu.misc import IndexException

    rng = np.random.default_rng(9)
    db = tmp_path / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord(f"s{i}", bytes(rng.choice(
            list(b"ACDEFGHIKLMNPQRSTVWY"), 80)))
        for i in range(4)])
    lit = tmp_path / "db.lit"
    iopts = opt_mod.IndexerOptions(domain=opt_mod.Domain.PROTEIN,
                                   db_file=str(db), index_file=str(lit))
    artifact.save_index(artifact.build_index(iopts), str(lit))
    good = lit.read_bytes()
    ref = artifact.load_index(str(lit))

    bad = tmp_path / "bad.lit"
    n_loaded = 0
    for i in range(24):
        if i < 10:                        # truncation
            cut = int(rng.integers(0, len(good)))
            data = good[:cut]
        else:                             # random bit flip
            data = bytearray(good)
            p = int(rng.integers(0, len(good)))
            data[p] ^= 1 << int(rng.integers(0, 8))
            data = bytes(data)
        bad.write_bytes(data)
        try:
            got = artifact.load_index(str(bad))
        except IndexException:
            continue
        n_loaded += 1
        assert np.array_equal(got.kmer.keys, ref.kmer.keys)
        assert got.ids == ref.ids
        assert all(np.array_equal(a, b) for a, b in zip(got.seqs, ref.seqs))
    # most corruptions must be caught (zip CRC + header checks)
    assert n_loaded <= 6, n_loaded
