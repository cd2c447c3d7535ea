"""BLAST tabular output (m8 / m9) with column selection.

Equivalent of the reference's SeqAn2 BlastTabular usage
(``/root/reference/src/search_output.hpp:305-344`` myWriteHeader,
``:464-479`` myWriteRecord, ``:735-750`` myWriteFooter) and the
BlastMatchField column system (``search_options.hpp:713-760``).

Coordinate untranslation follows NCBI/SeqAn2 conventions: 1-based
inclusive; for negative frames positions are mirrored onto the plus
strand so start > end.  Number formatting: pident/ppos "%.2f"
(SeqAn2 FormattedNumber), e-value via the NCBI ladder, bit score via
NCBI's tabular rules.
"""

from __future__ import annotations


FIELD_NAMES = {
    "qseqid": "query id",
    "sseqid": "subject id",
    "qlen": "query length",
    "slen": "subject length",
    "pident": "% identity",
    "nident": "identical",
    "length": "alignment length",
    "mismatch": "mismatches",
    "positive": "positives",
    "ppos": "% positives",
    "gapopen": "gap opens",
    "gaps": "gaps",
    "qstart": "q. start",
    "qend": "q. end",
    "sstart": "s. start",
    "send": "s. end",
    "evalue": "evalue",
    "bitscore": "bit score",
    "score": "score",
    "qframe": "query frame",
    "sframe": "sbjct frame",
    "frames": "query/sbjct frames",
    "staxids": "subject tax ids",
    "lcaid": "lca id",
    "lcataxid": "lca tax id",
}

STD_COLUMNS = ["qseqid", "sseqid", "pident", "length", "mismatch", "gapopen",
               "qstart", "qend", "sstart", "send", "evalue", "bitscore"]


def expand_columns(columns: list[str]) -> list[str]:
    out: list[str] = []
    for c in columns:
        if c == "std":
            out.extend(STD_COLUMNS)
        elif c in FIELD_NAMES:
            out.append(c)
        else:
            raise ValueError(
                f'Unknown column specifier "{c}". Please see -oc help for '
                "valid options.")
    return out


def format_evalue(ev: float) -> str:
    """NCBI tabular e-value ladder."""
    if ev <= 1.0e-180:
        return "0.0"
    if ev < 1.0e-99:
        return f"{ev:.0e}"  # 2e-100 style (exponent >= 100, never 0-padded)
    if ev < 0.0009:
        s = f"{ev:.0e}"
        return s
    if ev < 0.1:
        return f"{ev:.3f}"
    if ev < 1.0:
        return f"{ev:.2f}"
    if ev < 10.0:
        return f"{ev:.1f}"
    return f"{ev:.0f}"


def format_bitscore(bs: float) -> str:
    if bs > 9999:
        return f"{bs:.3e}"
    if bs > 99.9:
        return f"{bs:.0f}"
    return f"{bs:.1f}"


def untranslate_positions(start0: int, end0: int, frame_shift: int,
                          length: int, factor: int):
    """Map frame-space, 0-based half-open [start0, end0) to 1-based BLAST
    coordinates on the original (plus-strand) sequence.

    factor = 3 when the sequence was translated, else 1; frame_shift per
    _setFrames.  Negative frames mirror so that start > end.  For
    untranslated sequences only the SIGN of the frame shift matters
    (bisulfite dup frames carry |fs|=2 without a positional offset)."""
    if frame_shift == 0:
        return start0 + 1, end0
    if factor == 1:
        if frame_shift > 0:
            return start0 + 1, end0
        return length - start0, length - end0 + 1
    fs = abs(frame_shift)
    if frame_shift > 0:
        return factor * start0 + fs, factor * end0 + fs - 1
    return length - (factor * start0 + fs - 1), length - factor * end0 - fs + 2


def first_word(s: str) -> str:
    return s.split(None, 1)[0] if s else s


class BlastTabWriter:
    """m8 (no comments) / m9 (with comments) writer."""

    def __init__(self, path: str, columns: list[str], with_comments: bool,
                 version_string: str, db_name: str):
        self.columns = expand_columns(columns)
        self.with_comments = with_comments
        self.program_line = version_string
        self.db_name = db_name
        self.num_queries = 0
        from ..misc import open_output
        self.fh = open_output(path)

    def write_header(self) -> None:
        pass  # tabular formats carry no global header

    def write_record(self, q_id: str, matches: list[dict]) -> None:
        """matches: list of per-match field dicts (see fields_for_match)."""
        self.num_queries += 1
        if self.with_comments:
            self.fh.write(f"# {self.program_line}\n")
            self.fh.write(f"# Query: {q_id}\n")
            self.fh.write(f"# Database: {self.db_name}\n")
            if matches:
                names = ", ".join(FIELD_NAMES[c] for c in self.columns)
                self.fh.write(f"# Fields: {names}\n")
            self.fh.write(f"# {len(matches)} hits found\n")
        for m in matches:
            line = "\t".join(str(m[c]) for c in self.columns)
            if "_merge_annot" in m:          # multi-host exact-order merge
                line += "\t" + m["_merge_annot"]
            self.fh.write(line + "\n")

    def write_footer(self) -> None:
        if self.with_comments:
            self.fh.write(f"# BLAST processed {self.num_queries} queries\n")
        self.fh.close()


def fields_for_match(bm, q_id: str, s_id: str, program,
                     lca_id: str = "", lca_tax_id: int = 0) -> dict:
    """Compute every supported column for one BlastMatch."""
    qf = 3 if program.q_translated else 1
    sf = 3 if program.s_translated else 1
    qs, qe = untranslate_positions(bm.q_start, bm.q_end, bm.q_frame_shift,
                                   bm.q_length, qf)
    ss, se = untranslate_positions(bm.s_start, bm.s_end, bm.s_frame_shift,
                                   bm.s_length, sf)
    return {
        "qseqid": first_word(q_id),
        "sseqid": first_word(s_id),
        "qlen": bm.q_length,
        "slen": bm.s_length,
        "pident": f"{bm.identity:.2f}",
        "nident": bm.num_matches,
        "length": bm.align_length,
        "mismatch": bm.num_mismatches,
        "positive": bm.num_positives,
        "ppos": f"{bm.similarity:.2f}",
        "gapopen": bm.num_gap_opens,
        "gaps": bm.num_gaps,
        "qstart": qs,
        "qend": qe,
        "sstart": ss,
        "send": se,
        "evalue": format_evalue(bm.e_value),
        "bitscore": format_bitscore(bm.bit_score),
        "score": bm.raw_score,
        "qframe": bm.q_frame_shift,
        "sframe": bm.s_frame_shift,
        "frames": f"{bm.q_frame_shift}/{bm.s_frame_shift}",
        "staxids": ";".join(str(t) for t in bm.s_tax_ids) or "0",
        "lcaid": lca_id,
        "lcataxid": lca_tax_id,
    }
