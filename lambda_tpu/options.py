"""Option structures, per-domain defaults and profiles.

Mirrors the reference's option layer:
``/root/reference/src/shared_options.hpp`` (SharedOptions, domain_t),
``/root/reference/src/search_options.hpp`` (LambdaOptions, profiles,
per-domain seed defaults), ``/root/reference/src/mkindex_options.hpp``
(LambdaIndexerOptions, per-domain alphabet presets).
"""

from __future__ import annotations

import dataclasses
import enum
from pathlib import Path

from . import alphabets as ab


class Domain(enum.Enum):
    PROTEIN = "protein"
    NUCLEOTIDE = "nucleotide"
    BISULFITE = "bisulfite"


class BlastProgram(enum.Enum):
    BLASTN = "blastn"
    BLASTP = "blastp"
    BLASTX = "blastx"
    TBLASTN = "tblastn"
    TBLASTX = "tblastx"

    @property
    def q_translated(self) -> bool:
        return self in (BlastProgram.BLASTX, BlastProgram.TBLASTX)

    @property
    def s_translated(self) -> bool:
        return self in (BlastProgram.TBLASTN, BlastProgram.TBLASTX)

    @property
    def q_has_revcomp(self) -> bool:
        return self in (BlastProgram.BLASTN, BlastProgram.BLASTX, BlastProgram.TBLASTX)

    @property
    def s_has_revcomp(self) -> bool:
        return False  # subject is never reverse-complemented (strand via query)


def blast_program(trans_alph: str, orig_qry_alph: str, orig_sbj_alph: str) -> BlastProgram:
    """search_datastructures.hpp:329-335 decision table."""
    if trans_alph != ab.AMINO_ACID:
        return BlastProgram.BLASTN
    q_is_aa = orig_qry_alph == ab.AMINO_ACID
    s_is_aa = orig_sbj_alph == ab.AMINO_ACID
    if q_is_aa and s_is_aa:
        return BlastProgram.BLASTP
    if q_is_aa and not s_is_aa:
        return BlastProgram.TBLASTN
    if not q_is_aa and not s_is_aa:
        return BlastProgram.TBLASTX
    return BlastProgram.BLASTX


def qry_num_frames(program: BlastProgram, red_alph: str) -> int:
    if red_alph == ab.DNA3BS:
        return 4
    if program.q_translated:
        return 6
    if program.q_has_revcomp:
        return 2
    return 1


def sbj_num_frames(program: BlastProgram, red_alph: str) -> int:
    if red_alph == ab.DNA3BS:
        return 2
    if program.s_translated:
        return 6
    if program.s_has_revcomp:
        return 2
    return 1


@dataclasses.dataclass
class SearchOpts:
    seed_length: int = 0
    max_seed_dist: int = 1
    seed_offset: int = 0


@dataclasses.dataclass
class LambdaOptions:
    """Search options (LambdaOptions, search_options.hpp:54-109)."""

    query_file: str = ""
    index_file: str = ""
    domain: Domain = Domain.PROTEIN

    qry_orig_alphabet: str = "auto"
    output: str = "output.m8"
    out_file_format: int = 0  # -1 m0, 0 tab, 1 sam, 2 bam
    blast_tabular_with_comments: bool = False
    columns: list[str] = dataclasses.field(default_factory=lambda: ["std"])
    sam_bam_tags: list[str] = dataclasses.field(
        default_factory=lambda: ["AS", "NM", "ae", "ai", "qf"])
    sam_with_ref_header: bool = False
    sam_bam_seq: str = "uniq"  # always | uniq | never
    sam_bam_hard_clip: bool = True
    version_to_output_file: bool = True
    maximum_query_block_size: int = 10

    lazy_qry_file: bool = False

    seed_half_exact: bool = True
    adaptive_seeding: bool = True

    search_opts0: SearchOpts = dataclasses.field(default_factory=SearchOpts)
    search_opts: SearchOpts = dataclasses.field(default_factory=SearchOpts)

    scoring_method: int = 62  # blosumXX id; 0 = manual match/mismatch
    gap_open: int = -11
    gap_extend: int = -1
    match: int = 2
    mismatch: int = -3

    min_bit_score: int = -1
    max_e_value: float = 1e-2
    id_cutoff: int = 0
    max_matches: int = 25

    compute_lca: bool = False
    has_s_tax_ids: bool = False
    genetic_code: int = 1

    pre_scoring: int = 2
    pre_scoring_thresh: float = 2.0

    iterative_search: bool = True
    profile: str = "none"

    threads: int = 1
    db_shards: int = 1          # database shards over the device mesh
    q_shards: int = 1           # query data-parallel mesh axis
    # sequential host-resident database shards streamed through ONE
    # device per query batch (databases beyond device HBM; output bytes
    # identical to --db-shards N); the reference's envelope is host RAM
    # (search_algo.hpp:126-155) and this restores it on an accelerator
    db_stream: int = 1
    verbosity: int = 1
    command_line: str = ""

    # device execution knobs (no reference equivalent; TPU-specific).
    # 512 queries/batch feeds the extension kernel ~12k concurrent
    # alignments per dispatch on homolog-rich workloads — the kernel's
    # ≥67-GCUPS operating regime (docs/PERF.md §1) — and measured 17%
    # more e2e throughput than 256 (836 vs 716 q/s/chip, round 5);
    # 1024 measured no further gain.  The HBM preflight accounts the
    # banded substitution image, so oversized batches warn, not OOM.
    query_batch_size: int = 512
    max_hits_per_query_frame: int = 2048

    # multi-host deployment (docs/MULTIHOST.md):
    # append an internal annotation column to m8 lines (subject db
    # position + frame-space coordinates + raw score) so merge_m8 can
    # reproduce the single-host total order EXACTLY (incl. database-
    # position tie order, search_algo.hpp:832-862)
    merge_annotations: bool = False
    # "coordinator_addr:port,process_id,num_processes" -> calls
    # jax.distributed.initialize before the search (per-host runs share
    # no runtime state; init exercises the process-level runtime)
    distributed: str = "" 


def make_search_options(domain: Domain, **overrides) -> LambdaOptions:
    """Construct options with the reference's per-domain defaults
    (search_options.hpp:261-337) and profile handling (:631-682)."""
    opt = LambdaOptions(domain=domain)

    if domain == Domain.PROTEIN:
        opt.gap_open, opt.gap_extend = -11, -1
        opt.search_opts0 = SearchOpts(seed_length=10, seed_offset=5, max_seed_dist=0)
        opt.search_opts = SearchOpts(seed_length=11, seed_offset=3, max_seed_dist=1)
    elif domain == Domain.NUCLEOTIDE:
        opt.gap_open, opt.gap_extend = -5, -2
        opt.search_opts0 = SearchOpts(seed_length=14, seed_offset=9, max_seed_dist=0)
        opt.search_opts = SearchOpts(seed_length=14, seed_offset=7, max_seed_dist=1)
        opt.pre_scoring_thresh = 1.4
        opt.scoring_method = 0
    else:  # BISULFITE
        opt.gap_open, opt.gap_extend = -5, -2
        opt.search_opts0 = SearchOpts(seed_length=17, seed_offset=10, max_seed_dist=0)
        opt.search_opts = SearchOpts(seed_length=17, seed_offset=10, max_seed_dist=1)
        opt.pre_scoring_thresh = 1.5
        opt.max_e_value = 1e-9
        opt.scoring_method = 0

    profile = overrides.pop("profile", "none")
    for k, v in overrides.items():
        if not hasattr(opt, k):
            raise TypeError(f"unknown option {k!r}")
        setattr(opt, k, v)

    apply_profile(opt, profile)
    return opt


def apply_profile(opt: LambdaOptions, profile: str) -> None:
    """Profiles override manual flags (search_options.hpp:631-682)."""
    opt.profile = profile
    if profile == "none":
        return
    if profile == "fast":
        if opt.domain != Domain.PROTEIN:
            opt.iterative_search = False
            opt.search_opts.max_seed_dist = 0
            if opt.domain == Domain.NUCLEOTIDE:
                opt.search_opts.seed_offset = 9
        else:
            opt.search_opts0.seed_length = 12
            opt.search_opts0.seed_offset = 8
            opt.search_opts.seed_length = 10
            opt.search_opts.seed_offset = 5
            opt.search_opts.max_seed_dist = 0
        return
    if profile == "sensitive" or profile.startswith("pairs"):
        if opt.domain == Domain.PROTEIN:
            opt.search_opts0.seed_length = 9
            opt.search_opts0.seed_offset = 4
            opt.search_opts.seed_length = 8
            opt.search_opts.seed_offset = 3
            opt.pre_scoring = 3
            opt.pre_scoring_thresh = 1.9
        elif opt.domain == Domain.NUCLEOTIDE:
            opt.search_opts0.seed_offset = 3
            opt.search_opts.seed_offset = 3
        else:
            opt.search_opts0.seed_length = 16
            opt.search_opts0.seed_offset = 8
            opt.search_opts.seed_length = 15
            opt.search_opts.seed_offset = 10

        if profile.startswith("pairs"):
            opt.iterative_search = False
        if profile == "pairs-sensitive":
            opt.search_opts.seed_length -= 1
        return
    raise ValueError(f"unknown profile {profile!r}")


def detect_output_format(opt: LambdaOptions) -> None:
    """Set out_file_format from the output extension
    (search_options.hpp:684-710)."""
    path = opt.output
    for comp_ext in (".gz", ".bz2"):
        if path.endswith(comp_ext):
            path = path[: -len(comp_ext)]
    ext = Path(path).suffix
    if ext == ".sam":
        opt.out_file_format = 1
    elif ext == ".bam":
        opt.out_file_format = 2
    elif ext == ".m0":
        opt.out_file_format = -1
    elif ext == ".m8":
        opt.out_file_format = 0
        opt.blast_tabular_with_comments = False
    elif ext == ".m9":
        opt.out_file_format = 0
        opt.blast_tabular_with_comments = True
    else:
        raise ValueError(f"unsupported output extension {ext!r}")


@dataclasses.dataclass
class IndexerOptions:
    """mkindex options (LambdaIndexerOptions, mkindex_options.hpp:36-50)."""

    db_file: str = ""
    index_file: str = ""
    domain: Domain = Domain.PROTEIN
    acc_to_tax_map_file: str = ""
    tax_dump_dir: str = ""
    truncate_ids: bool = True
    input_alphabet: str = "auto"
    alphabet_reduction: str = "li10"  # protein default (mkindex_options.hpp:182)
    genetic_code: int = 1
    threads: int = 1
    verbosity: int = 1
    kmer_words: int = 4     # uint32 key words per position: capacity/size knob
    # sharded artifact: build + store the k-mer index as N per-subject-range
    # shards (sidecar files); search can load a subset per host and feed
    # device shards directly (the reference's single index_file contract,
    # shared_definitions.hpp:343-379, extended for scale-out)
    shards: int = 1

    @property
    def has_s_tax_ids(self) -> bool:
        return bool(self.acc_to_tax_map_file)

    def resolve_alphabets(self, detected_input: str | None = None):
        """Return (orig_alph, trans_alph, red_alph) following
        mkindex_options.hpp:179-241."""
        if self.domain == Domain.PROTEIN:
            orig = self.input_alphabet
            if orig == "auto":
                orig = detected_input or ab.AMINO_ACID
            trans = ab.AMINO_ACID
            red = {"none": ab.AMINO_ACID,
                   "murphy10": ab.MURPHY10,
                   "li10": ab.LI10}[self.alphabet_reduction]
            return orig, trans, red
        if self.domain == Domain.NUCLEOTIDE:
            return ab.DNA5, ab.DNA5, ab.DNA4
        return ab.DNA5, ab.DNA5, ab.DNA3BS
