import gzip

from lambda_tpu.io import fasta


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fasta"
    recs = [
        fasta.SeqRecord("seq1 first sequence", b"ACGTACGT"),
        fasta.SeqRecord("seq2", b"MKVLAA"),
    ]
    fasta.write_fasta(p, recs)
    back = fasta.read_fasta(p)
    assert [(r.id, r.seq) for r in back] == [(r.id, r.seq) for r in recs]


def test_fasta_truncate_ids(tmp_path):
    p = tmp_path / "x.fasta"
    fasta.write_fasta(p, [fasta.SeqRecord("seq1 rest of id", b"ACGT")])
    back = fasta.read_fasta(p, truncate_ids=True)
    assert back[0].id == "seq1"


def test_fasta_multiline_and_gz(tmp_path):
    p = tmp_path / "x.fasta.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a\nACGT\nACGT\n>b desc\nTTTT\n")
    back = fasta.read_fasta(p)
    assert back[0].seq == b"ACGTACGT"
    assert back[1].id == "b desc"
    assert fasta.count_seqs(p) == 2


def test_fastq(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\nIIII\n")
    back = fasta.read_fasta(p)
    assert [(r.id, r.seq) for r in back] == [("r1", b"ACGT"), ("r2", b"GGTT")]


def test_async_input_buffer_order_and_errors():
    from lambda_tpu.io.async_buffer import async_input_buffer

    assert list(async_input_buffer(range(1000), capacity=7)) == list(range(1000))

    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    it = async_input_buffer(boom(), capacity=2)
    assert next(it) == 1
    assert next(it) == 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_fastq_trailing_blank_line(tmp_path):
    p = tmp_path / "r.fastq"
    p.write_text("@r1\nACGT\n+\nIIII\n\n")
    from lambda_tpu.io import fasta as f

    recs = f.read_fasta(str(p))
    assert len(recs) == 1 and recs[0].seq == b"ACGT"


def test_fastq_multiline_records(tmp_path):
    # wrapped sequence and quality lines are legal FASTQ (the reference's
    # bio::io reader accepts them); '@' may start a quality line
    p = tmp_path / "ml.fastq"
    p.write_text("@r1\nACGT\nACGT\n+\n@IIIIIII\n@r2 desc\nGGCC\n+r2\nIIII\n")
    recs = list(fasta.iter_seqs(p))
    assert [r.id for r in recs] == ["r1", "r2 desc"]
    assert recs[0].seq == b"ACGTACGT"
    assert recs[1].seq == b"GGCC"


def test_fastq_truncated_quals_raise(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("@r1\nACGTACGT\n+\nIIII\n")
    import pytest
    with pytest.raises(ValueError):
        list(fasta.iter_seqs(p))


def test_async_input_buffer_abandoned_consumer_stops_producer():
    # consumer abandons the generator mid-stream: the producer must not
    # stay blocked in q.put() holding the source open
    import gc
    import threading
    import time
    from lambda_tpu.io.async_buffer import async_input_buffer

    closed = []

    def src():
        try:
            for i in range(10000):
                yield i
        finally:
            closed.append(True)

    it = async_input_buffer(src(), capacity=2)
    assert next(it) == 0
    before = threading.active_count()
    it.close()  # GeneratorExit at the yield -> stop flag
    gc.collect()
    deadline = time.time() + 5.0
    while time.time() < deadline and not closed:
        time.sleep(0.05)
    assert closed, "producer did not exit / close the source"
