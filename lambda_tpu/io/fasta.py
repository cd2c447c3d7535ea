"""FASTA/FASTQ reading and writing (host side).

TPU-native equivalent of biocpp-io's seq reader usage in the reference
(``/root/reference/src/mkindex_algo.hpp:115-136`` db loading,
``/root/reference/src/search_algo.hpp:332-415`` query loading, including
``truncate_ids`` semantics).

Supports plain and gzip-compressed files, FASTA and FASTQ, auto-detected
from content.  A streaming iterator keeps memory at O(record) for the
lazy-query path (reference view_async_input_buffer.hpp).
"""

from __future__ import annotations

import dataclasses
import gzip
import io
from pathlib import Path
from typing import Iterator


@dataclasses.dataclass
class SeqRecord:
    id: str
    seq: bytes  # raw characters


def _open_text(path: str | Path):
    path = str(path)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r", encoding="ascii")


def iter_seqs(path: str | Path, truncate_ids: bool = False) -> Iterator[SeqRecord]:
    """Stream records from a FASTA or FASTQ file (optionally .gz)."""
    with _open_text(path) as fh:
        first = fh.read(1)
        if not first:
            return
        if first == ">":
            yield from _iter_fasta(fh, truncate_ids)
        elif first == "@":
            yield from _iter_fastq(fh, truncate_ids)
        else:
            raise ValueError(f"{path}: not a FASTA/FASTQ file (starts with {first!r})")


def _clean_id(line: str, truncate_ids: bool) -> str:
    ident = line.strip()
    if truncate_ids:
        ident = ident.split(None, 1)[0] if ident else ident
    return ident


def _iter_fasta(fh, truncate_ids: bool) -> Iterator[SeqRecord]:
    # caller consumed the leading '>'
    ident = _clean_id(fh.readline(), truncate_ids)
    chunks: list[str] = []
    for line in fh:
        if line.startswith(">"):
            yield SeqRecord(ident, "".join(chunks).encode("ascii"))
            ident = _clean_id(line[1:], truncate_ids)
            chunks = []
        else:
            chunks.append(line.strip())
    yield SeqRecord(ident, "".join(chunks).encode("ascii"))


def _iter_fastq(fh, truncate_ids: bool) -> Iterator[SeqRecord]:
    # caller consumed the leading '@'.  Multi-line (wrapped) records are
    # legal FASTQ and accepted by the reference's bio::io reader: the
    # sequence runs until the '+' line, the qualities until their total
    # length matches the sequence ('@' may legally start a quality line,
    # so length — not the character — is the delimiter).
    while True:
        id_line = fh.readline()
        if not id_line:
            return
        ident = _clean_id(id_line, truncate_ids)
        seq_chunks = []
        line = fh.readline()
        while line and not line.startswith("+"):
            seq_chunks.append(line.strip())
            line = fh.readline()
        if not line.startswith("+"):
            raise ValueError("malformed FASTQ record")
        seq = "".join(seq_chunks)
        qlen = 0
        while qlen < len(seq):
            qline = fh.readline()
            if not qline:
                raise ValueError("malformed FASTQ record (truncated qualities)")
            qlen += len(qline.strip())
        if qlen != len(seq):
            raise ValueError("malformed FASTQ record (quality length mismatch)")
        yield SeqRecord(ident, seq.encode("ascii"))
        nxt = fh.read(1)
        while nxt and nxt in "\r\n \t":   # tolerate a whitespace tail
            nxt = fh.read(1)
        if not nxt:
            return
        if nxt != "@":
            raise ValueError("malformed FASTQ record separator")


def read_fasta(path: str | Path, truncate_ids: bool = False) -> list[SeqRecord]:
    return list(iter_seqs(path, truncate_ids))


def count_seqs(path: str | Path) -> int:
    """Count records without storing them (reference countQuery,
    search_algo.hpp:368-395)."""
    n = 0
    for _ in iter_seqs(path):
        n += 1
    return n


def write_fasta(path: str | Path, records: list[SeqRecord], width: int = 80) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as fh:
        for r in records:
            fh.write(f">{r.id}\n")
            s = r.seq.decode("ascii")
            for i in range(0, len(s), width):
                fh.write(s[i : i + width] + "\n")
