"""Merge per-host BLAST-tab outputs of a sharded multi-host search.

Each host of a multi-host deployment searches its own shard subset
(``searchp --shard-subset h``) and writes an m8/m9 file whose e-values
and bit scores are computed against the GLOBAL database length, so the
per-host lines are directly comparable.  This tool merges them back
into one per-query record stream:

* query order follows the first input file (all hosts see the same
  query stream, so any input works);
* within a query, matches sort by (bitScore desc, eValue asc, subject,
  coordinates) — the deterministic total order of
  records.sort_dedup_cutoff projected onto the m8 columns;
* ``--max-matches N`` re-applies the per-query cutoff the per-host runs
  could not apply globally.

Usage: python -m lambda_tpu.tools.merge_m8 out.m8 host0.m8 host1.m8 ...
"""

from __future__ import annotations

import sys


def _key(fields: list[str]):
    # m8: qid sid pident length mism gapo qstart qend sstart send eval bits
    return (-float(fields[11]), float(fields[10]), fields[1],
            int(fields[6]), int(fields[7]), int(fields[8]), int(fields[9]))


def merge(paths: list[str], out_path: str, max_matches: int | None = None
          ) -> None:
    per_query: dict[str, list[list[str]]] = {}
    order: list[str] = []
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if not line.strip() or line.startswith("#"):
                    continue
                f = line.rstrip("\n").split("\t")
                if f[0] not in per_query:
                    per_query[f[0]] = []
                    order.append(f[0])
                per_query[f[0]].append(f)
    with open(out_path, "w") as out:
        for q in order:
            rows = sorted(per_query[q], key=_key)
            if max_matches is not None:
                rows = rows[:max_matches]
            for f in rows:
                out.write("\t".join(f) + "\n")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="merge per-host sharded m8/m9 outputs")
    p.add_argument("output")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-n", "--max-matches", type=int, default=None)
    a = p.parse_args(argv)
    merge(a.inputs, a.output, a.max_matches)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
