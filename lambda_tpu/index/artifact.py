"""Versioned on-disk index artifact — the TPU-native equivalent of the
reference's ``index_file`` + cereal serialization
(``/root/reference/src/shared_definitions.hpp:316-391``,
``/root/reference/src/mkindex.cpp:235-258`` writer,
``/root/reference/src/search_algo.hpp:69-120,240-321`` reader).

Format: a numpy ``.npz`` container (zip of raw arrays — fast, mmap-able)
holding a JSON header (options: generation, index type, alphabets, genetic
code) plus flat arrays.  ``read_index_options`` peeks only at the header,
mirroring ``fake_index_file``.  A ``.json`` debug dump (the ``.lta``
equivalent) is available via ``dump_json``.

Default extension: ``.lit`` (Lambda Index, Tpu).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

from .. import alphabets as ab
from .. import frames as fr
from .. import options as opt_mod
from ..io import fasta
from . import taxonomy
from .build import KmerIndex, build_kmer_index

# bump on incompatible changes (mirrors supportedIndexGeneration,
# shared_definitions.hpp:316)
INDEX_GENERATION = 1


@dataclasses.dataclass
class IndexData:
    """In-memory index (loaded or freshly built)."""

    # header/options
    generation: int
    index_type: str  # "kmer"
    orig_alph: str
    trans_alph: str
    red_alph: str
    genetic_code: int

    # payload
    ids: list[str]
    seqs: list[np.ndarray]              # original sequences (rank arrays)
    s_tax_ids: list[list[int]]
    taxon_parents: np.ndarray           # uint32, may be empty
    taxon_heights: np.ndarray           # uint8, may be empty
    taxon_names: list[str]
    kmer: KmerIndex

    # derived on load (translated frames for prescore/extension)
    trans_frames: list[np.ndarray] = dataclasses.field(default_factory=list)
    trans_concat: np.ndarray | None = None
    trans_offsets: np.ndarray | None = None
    trans_lengths: np.ndarray | None = None

    @property
    def num_subjects(self) -> int:
        return len(self.seqs)

    @property
    def sbj_num_frames(self) -> int:
        return len(self.trans_frames) // max(len(self.seqs), 1)

    @property
    def db_total_length(self) -> int:
        """Sum of reduced (== translated) frame lengths; feeds dbTotalLength
        for e-values (search_algo.hpp:317-319)."""
        return int(self.trans_offsets[-1]) if self.trans_offsets is not None else 0

    @property
    def has_s_tax_ids(self) -> bool:
        return len(self.s_tax_ids) == len(self.seqs) and any(
            len(x) for x in self.s_tax_ids)

    @property
    def has_tax_tree(self) -> bool:
        return len(self.taxon_names) > 0

    def materialize_frames(self) -> None:
        """Recompute translated subject frames from original seqs (the
        reference does this lazily at load, search_algo.hpp:274-275)."""
        self.trans_frames = fr.subject_trans_frames(
            self.seqs, self.orig_alph, self.trans_alph, self.red_alph,
            self.genetic_code)
        self.trans_concat, self.trans_offsets, self.trans_lengths = (
            fr.concat_frames(self.trans_frames))


def build_index(opts: opt_mod.IndexerOptions, verbose_print=None) -> IndexData:
    """mkindex driver (realMain, mkindex.cpp:199-262)."""
    vp = verbose_print or (lambda *a, **k: None)

    # --- load db (loadSubjSeqsAndIds, mkindex_algo.hpp:48-192)
    t0 = time.time()
    records = fasta.read_fasta(opts.db_file, truncate_ids=opts.truncate_ids)
    if not records:
        raise RuntimeError("ERROR: No sequences in file. Aborting.")
    for r in records:
        if len(r.seq) == 0:
            raise RuntimeError(
                "ERROR: Unexpectedly encountered a sequence of length 0 in the file.")
    ids = [r.id for r in records]

    # alphabet detection for protein domain
    detected = None
    if opts.domain == opt_mod.Domain.PROTEIN and opts.input_alphabet == "auto":
        detected = detect_alphabet(records[0].seq)
    orig_alph, trans_alph, red_alph = opts.resolve_alphabets(detected)

    seqs = [ab.encode(r.seq, orig_alph) for r in records]
    vp(f"Loaded {len(seqs)} subject sequences in {time.time()-t0:.2f}s")

    # --- taxonomy (optional)
    s_tax_ids: list[list[int]] = []
    parents = np.zeros(0, dtype=np.uint32)
    heights = np.zeros(0, dtype=np.uint8)
    names: list[str] = []
    if opts.acc_to_tax_map_file:
        acc_to_rank = taxonomy.build_acc_to_rank(ids)
        s_tax_ids, present = taxonomy.read_acc_to_tax_map(
            opts.acc_to_tax_map_file, acc_to_rank, len(ids))
        if opts.tax_dump_dir:
            parents, heights, names = taxonomy.build_tax_tree(
                opts.tax_dump_dir, present)

    # --- frames + k-mer index (generateIndex, mkindex_algo.hpp:600-618)
    t0 = time.time()
    trans = fr.subject_trans_frames(seqs, orig_alph, trans_alph, red_alph,
                                    opts.genetic_code)
    red = fr.reduce_frames(trans, trans_alph, red_alph)
    red_concat, offsets, _ = fr.concat_frames(red)
    kmer = build_kmer_index(red_concat, offsets, ab.ALPHABET_SIZES[red_alph],
                            words=opts.kmer_words)
    vp(f"Generated index over {len(red_concat)} positions in {time.time()-t0:.2f}s")

    idx = IndexData(
        generation=INDEX_GENERATION,
        index_type="kmer",
        orig_alph=orig_alph,
        trans_alph=trans_alph,
        red_alph=red_alph,
        genetic_code=opts.genetic_code,
        ids=ids,
        seqs=seqs,
        s_tax_ids=s_tax_ids,
        taxon_parents=parents,
        taxon_heights=heights,
        taxon_names=names,
        kmer=kmer,
    )
    idx.trans_frames = trans
    idx.trans_concat, idx.trans_offsets, idx.trans_lengths = fr.concat_frames(trans)
    return idx


def detect_alphabet(seq: bytes) -> str:
    """detectSeqFileAlphabet (shared_misc.hpp:83): classify the first
    record.  Like the reference, sequences valid over the IUPAC dna15
    ambiguity alphabet are treated as DNA (ambiguity codes behave as N);
    anything else is amino acid."""
    up = seq.upper()
    if all(c in b"ACGTUNRYSWKMBDHV" for c in up):
        return ab.DNA5
    return ab.AMINO_ACID


# ---------------------------------------------------------------------------
# (de)serialization
# ---------------------------------------------------------------------------


def _pack_strings(strings: list[str]):
    blob = "\0".join(strings).encode("utf-8")
    return np.frombuffer(blob, dtype=np.uint8).copy()


def _unpack_strings(arr: np.ndarray) -> list[str]:
    if arr.size == 0:
        return []
    return arr.tobytes().decode("utf-8").split("\0")


def _pack_ragged_ints(lists: list[list[int]]):
    lens = np.array([len(x) for x in lists], dtype=np.int64)
    offs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.array([v for x in lists for v in x], dtype=np.uint32)
    return flat, offs


def _unpack_ragged_ints(flat: np.ndarray, offs: np.ndarray) -> list[list[int]]:
    return [flat[offs[i] : offs[i + 1]].tolist() for i in range(len(offs) - 1)]


def save_index(idx: IndexData, path: str) -> None:
    header = dict(
        generation=idx.generation,
        index_type=idx.index_type,
        orig_alph=idx.orig_alph,
        trans_alph=idx.trans_alph,
        red_alph=idx.red_alph,
        genetic_code=idx.genetic_code,
        kmer_bits=idx.kmer.bits,
        kmer_words=idx.kmer.words,
        kmer_alphabet_size=idx.kmer.alphabet_size,
    )
    seq_concat, seq_offsets, _ = fr.concat_frames(idx.seqs)
    stax_flat, stax_offs = _pack_ragged_ints(idx.s_tax_ids)
    np.savez(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8).copy(),
        ids=_pack_strings(idx.ids),
        seq_concat=seq_concat,
        seq_offsets=seq_offsets,
        stax_flat=stax_flat,
        stax_offsets=stax_offs,
        taxon_parents=idx.taxon_parents,
        taxon_heights=idx.taxon_heights,
        taxon_names=_pack_strings(idx.taxon_names),
        kmer_keys=idx.kmer.keys,
        kmer_pos=idx.kmer.pos,
        kmer_frame=idx.kmer.frame,
    )
    # numpy appends .npz; normalize to requested path
    import os

    if not str(path).endswith(".npz") and os.path.exists(str(path) + ".npz"):
        os.replace(str(path) + ".npz", path)


def read_index_options(path: str) -> dict:
    """Header-only peek incl. generation check (readIndexOptions,
    search_algo.hpp:69-120)."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(z["header"].tobytes().decode())
    if header["generation"] != INDEX_GENERATION:
        raise RuntimeError(
            f"ERROR: this version only supports INDEXES of generation "
            f"{INDEX_GENERATION}, but the provided index was of generation: "
            f"{header['generation']}. PLEASE RECREATE THE INDEX!")
    return header


def load_index(path: str) -> IndexData:
    import zipfile

    from ..misc import IndexException

    try:
        header = read_index_options(path)
    except RuntimeError as e:
        # generation mismatch raised inside read_index_options
        from ..misc import strip_error_prefix
        raise IndexException(strip_error_prefix(e)) from e
    except (OSError, KeyError, ValueError, zipfile.BadZipFile) as e:
        raise IndexException(
            f"could not open or parse the index at '{path}': {e}\n"
            "       Did you create it with the same version's mkindex*?") \
            from e
    try:
        return _load_payload(path, header)
    except (OSError, KeyError, ValueError, zipfile.BadZipFile) as e:
        raise IndexException(
            f"the index at '{path}' is corrupt or truncated: {e}") from e


def _load_payload(path: str, header: dict) -> IndexData:
    with np.load(path, allow_pickle=False) as z:
        ids = _unpack_strings(z["ids"])
        seq_concat = z["seq_concat"]
        seq_offsets = z["seq_offsets"]
        seqs = [seq_concat[seq_offsets[i] : seq_offsets[i + 1]]
                for i in range(len(seq_offsets) - 1)]
        s_tax_ids = _unpack_ragged_ints(z["stax_flat"], z["stax_offsets"])
        kmer = KmerIndex(
            alphabet_size=header["kmer_alphabet_size"],
            bits=header["kmer_bits"],
            words=header["kmer_words"],
            keys=z["kmer_keys"],
            pos=z["kmer_pos"],
            frame=z["kmer_frame"],
        )
        idx = IndexData(
            generation=header["generation"],
            index_type=header["index_type"],
            orig_alph=header["orig_alph"],
            trans_alph=header["trans_alph"],
            red_alph=header["red_alph"],
            genetic_code=header["genetic_code"],
            ids=ids,
            seqs=seqs,
            s_tax_ids=s_tax_ids,
            taxon_parents=z["taxon_parents"],
            taxon_heights=z["taxon_heights"],
            taxon_names=_unpack_strings(z["taxon_names"]),
            kmer=kmer,
        )
    idx.materialize_frames()
    return idx


def dump_json(idx: IndexData, path: str) -> None:
    """Human-readable debug dump (the .lta analog)."""
    doc = dict(
        generation=idx.generation,
        index_type=idx.index_type,
        orig_alph=idx.orig_alph,
        trans_alph=idx.trans_alph,
        red_alph=idx.red_alph,
        genetic_code=idx.genetic_code,
        num_subjects=idx.num_subjects,
        ids=idx.ids,
        seqs=[ab.decode(s, idx.orig_alph) for s in idx.seqs],
        s_tax_ids=idx.s_tax_ids,
        num_kmer_positions=idx.kmer.num_positions,
    )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
