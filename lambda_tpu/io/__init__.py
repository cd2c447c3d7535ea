from .fasta import read_fasta, write_fasta, SeqRecord  # noqa: F401
