"""Taxonomy support: accession extraction, acc->taxid mapping, taxonomic
tree thinning/flattening and LCA helpers.

Port of ``/root/reference/src/mkindex_algo.hpp:69-110`` (accession regex),
``:277-348`` (mapTaxIDs), ``:354-598`` (parseAndStoreTaxTree) and
``/root/reference/src/mkindex_misc.hpp:69-144`` (mapping file readers).
This is host-side bookkeeping, not device work.
"""

from __future__ import annotations

import gzip
import re

import numpy as np

# see http://www.uniprot.org/help/accession_numbers and NCBI formats
# (mkindex_algo.hpp:73-80)
ACCESSION_REGEX = re.compile(
    "[OPQ][0-9][A-Z0-9]{3}[0-9]|[A-NR-Z][0-9]([A-Z][A-Z0-9]{2}[0-9]){1,2}|"  # UNIPROT
    "[A-Z][0-9]{5}|[A-Z]{2}[0-9]{6}|"                                        # NCBI nucl
    "[A-Z]{3}[0-9]{5}|"                                                      # NCBI prot
    "[A-Z]{4}[0-9]{8,10}|"                                                   # NCBI wgs
    "[A-Z]{5}[0-9]{7}|"                                                      # NCBI mga
    "(NC|AC|NG|NT|NW|NZ|NM|NR|XM|XR|NP|AP|XP|YP|ZP)_[0-9]+|"                 # RefSeq
    "UPI[A-F0-9]{10}"                                                        # UniParc
)


def extract_accessions(seq_id: str) -> list[str]:
    return [m.group(0) for m in ACCESSION_REGEX.finditer(seq_id)]


def build_acc_to_rank(ids: list[str]) -> dict[str, int]:
    """Map every accession found in any subject id to that subject's rank
    (loadSubjSeqsAndIds, mkindex_algo.hpp:86-110)."""
    acc_to_rank: dict[str, int] = {}
    for rank, seq_id in enumerate(ids):
        for acc in extract_accessions(seq_id):
            acc_to_rank[acc] = rank
    return acc_to_rank


def _open_text(path: str):
    p = str(path)
    if p.endswith((".gz", ".bgzf")):
        return gzip.open(path, "rt")
    if p.endswith(".bz2"):
        import bz2
        return bz2.open(path, "rt")
    return open(path, "r")


def read_acc_to_tax_map(path: str, acc_to_rank: dict[str, int],
                        num_subjects: int, vp=None):
    """Parse an NCBI .accession2taxid or UniProt .dat mapping file
    (mapTaxIDs, mkindex_algo.hpp:277-348).  Returns (s_tax_ids,
    tax_id_present) where s_tax_ids is a list of per-subject taxid lists.
    ``vp(level, msg)`` prints the unmapped-subject accounting."""
    s_tax_ids: list[list[int]] = [[] for _ in range(num_subjects)]
    present: set[int] = set()

    base = re.sub(r"\.(gz|bgzf|bz2)$", "", str(path))
    if base.endswith(".accession2taxid"):
        with _open_text(path) as fh:
            header = fh.readline().rstrip("\n")
            if header != "accession\taccession.version\ttaxid\tgi":
                raise ValueError("Unexpected first line in NCBI taxid file.")
            for line in fh:
                fields = line.rstrip("\n").split("\t")
                if len(fields) < 3:
                    continue
                rank = acc_to_rank.get(fields[0])
                if rank is not None:
                    tid = int(fields[2])
                    s_tax_ids[rank].append(tid)
                    present.add(tid)
    elif base.endswith(".dat"):
        with _open_text(path) as fh:
            for line in fh:
                fields = line.rstrip("\n").split("\t")
                if len(fields) < 3 or fields[1] != "NCBI_TaxID":
                    continue
                rank = acc_to_rank.get(fields[0])
                if rank is not None:
                    tid = int(fields[2])
                    s_tax_ids[rank].append(tid)
                    present.add(tid)
    else:
        raise ValueError("extension of acc-to-tax-map file not handled")

    present.add(1)  # root node is always present (mkindex_algo.hpp:308-310)

    # unmapped/multi-mapped accounting + wrong-map-file warning
    # (mapTaxIDs, mkindex_algo.hpp:316-346)
    if vp is not None:
        nomap = sum(1 for s in s_tax_ids if len(s) == 0)
        multi = sum(1 for s in s_tax_ids if len(s) > 1)
        vp(2, f"Subjects without tax IDs:             "
              f"{nomap}/{num_subjects}\n"
              f"Subjects with more than one tax ID:   "
              f"{multi}/{num_subjects}\n")
        if nomap > 0 and num_subjects // nomap < 5:
            vp(1, f"WARNING: {nomap * 100.0 / num_subjects}% of subjects "
                  "have no taxID.\n"
                  "         Maybe you specified the wrong map file?\n")
    return s_tax_ids, present


def build_tax_tree(tax_dump_dir: str, present: set[int]):
    """Parse nodes.dmp/names.dmp, thin to present nodes + ancestors, flatten
    indegree-1 internal nodes, compute heights
    (parseAndStoreTaxTree, mkindex_algo.hpp:354-598).

    Returns (parents u32 array, heights u8 array, names list[str]).
    """
    parents_map: dict[int, int] = {}
    max_id = 1
    with open(f"{tax_dump_dir}/nodes.dmp") as fh:
        for line in fh:
            fields = [f.strip() for f in line.split("|")]
            n, parent = int(fields[0]), int(fields[1])
            parents_map[n] = parent
            max_id = max(max_id, n)

    parents = np.zeros(max_id + 1, dtype=np.uint32)
    for n, p in parents_map.items():
        parents[n] = p

    # mark ancestors of present nodes
    present_arr = np.zeros(max_id + 1, dtype=bool)
    for t in present:
        if t <= max_id:
            present_arr[t] = True
    present_or_parent = present_arr.copy()
    for t in present:
        if t > max_id:
            continue
        cur = t
        while cur > 1:
            cur = int(parents[cur])
            present_or_parent[cur] = True

    # drop unneeded nodes
    parents[~present_or_parent] = 0

    # indegrees
    indeg = np.bincount(parents, minlength=max_id + 1)

    # only kept nodes need walking: restrict the Python loops to the
    # present-or-ancestor subset (~hundreds) instead of all ~2.6M ids
    kept = np.nonzero(present_or_parent)[0]

    # flatten: skip chains of indegree-1 internal nodes that do not
    # themselves carry sequences
    for i in kept:
        cur = int(parents[i])
        while cur > 1 and indeg[cur] == 1 and not present_arr[cur]:
            cur = int(parents[cur])
        parents[i] = cur

    # disconnect now-unused intermediates
    for i in kept:
        if indeg[i] == 1 and not present_arr[i]:
            parents[i] = 0
            present_or_parent[i] = False

    # heights
    heights = np.zeros(max_id + 1, dtype=np.uint8)
    for i in np.nonzero(present_or_parent)[0]:
        h = 0
        cur = int(parents[i])
        while cur > 1:
            cur = int(parents[cur])
            h += 1
        heights[i] = min(h, 255)

    # names
    names = [""] * (max_id + 1)
    with open(f"{tax_dump_dir}/names.dmp") as fh:
        for line in fh:
            fields = [f.strip() for f in line.split("|")]
            if len(fields) >= 4 and fields[3] == "scientific name":
                tid = int(fields[0])
                if tid >= len(names):
                    raise ValueError(
                        f"taxonomical ID is {tid}, but no such taxon in tree.")
                if present_or_parent[tid]:
                    names[tid] = fields[1]

    names[0] = "invalid"
    for i in range(max_id + 1):
        if present_or_parent[i] and not names[i]:
            names[i] = "n/a"

    return parents, heights, names


def compute_lca(parents: np.ndarray, heights: np.ndarray, n1: int, n2: int) -> int:
    """LCA walk (search_misc.hpp:86-112)."""
    if n1 == n2:
        return n1
    h1, h2 = int(heights[n1]), int(heights[n2])
    for _ in range(h1 - h2 if h1 > h2 else 0):
        n1 = int(parents[n1])
    for _ in range(h2 - h1 if h2 > h1 else 0):
        n2 = int(parents[n2])
    while n1 != 0 and n2 != 0:
        if n1 == n2:
            return n1
        n1 = int(parents[n1])
        n2 = int(parents[n2])
    raise RuntimeError("LCA-computation error: One of the paths didn't lead to root.")
