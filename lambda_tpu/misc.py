"""Shared utilities: verbosity-gated printing, progress bar, RAM checks.

Port of ``/root/reference/src/shared_misc.hpp`` (myPrint :116-137,
printProgressBar :54-72, getTotalSystemMemory/fileSize :139-219) and
``/root/reference/src/search_algo.hpp:126-155`` (checkRAM).
"""

from __future__ import annotations

import os
import sys


def my_print(verbosity: int, level: int, *msg, end="\n") -> None:
    if verbosity >= level:
        print(*msg, sep="", end=end, flush=True)


class ProgressBar:
    """0%..100% tick bar (printProgressBar port)."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.last = 0
        if enabled:
            print("0%  10%  20%  30%  40%  50%  60%  70%  80%  90%  100%\n|",
                  end="", flush=True)

    def update(self, done: int, total: int) -> None:
        if not self.enabled or total == 0:
            return
        cur = (done * 50 // total) * 2
        while self.last < cur and self.last < 100:
            self.last += 2
            if self.last % 10 == 0:
                print("*", end="", flush=True)
            else:
                print("-", end="", flush=True)

    def finish(self) -> None:
        if self.enabled:
            self.update(1, 1)
            print("", flush=True)


def total_system_memory() -> int:
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):
        return 0


def check_ram(index_path: str, query_path: str, lazy: bool, verbosity: int) -> None:
    """checkRAM (search_algo.hpp:126-155): warn when the estimated
    requirement exceeds physical memory."""
    my_print(verbosity, 1, "Checking memory requirements... ", end="")
    ram = total_system_memory()
    try:
        size_index = os.path.getsize(index_path)
        size_query = os.path.getsize(query_path)
    except OSError:
        my_print(verbosity, 1, "skipped.")
        return
    required = (size_index * 12) // 10 if lazy \
        else ((size_index + size_query) * 12) // 10
    if ram and required >= ram:
        my_print(verbosity, 1, "")
        print(f"WARNING: You need approximately {required // 2**20}MB of "
              f"memory, but you have only {ram // 2**20} :'(\n"
              "You should abort this run and try on a machine with more "
              "memory!", file=sys.stderr)
    else:
        my_print(verbosity, 1, "met.")
    my_print(verbosity, 2, f"Detected: {ram // 2**20}MB, "
                           f"Estimated: {required // 2**20}MB\n")


def print_search_options(opt) -> None:
    """printOptions (search_options.hpp:833-910)."""
    so, so0 = opt.search_opts, opt.search_opts0
    print("OPTIONS\n"
          " INPUT\n"
          f"  query file:               {opt.query_file}\n"
          f"  index file:               {opt.index_file}\n"
          " OUTPUT (file)\n"
          f"  output file:              {opt.output}\n"
          f"  maximum e-value:          {opt.max_e_value}\n"
          f"  minimum bit-score:        {opt.min_bit_score}\n"
          f"  minimum % identity:       {opt.id_cutoff}\n"
          f"  max #matches per query:   {opt.max_matches}\n"
          f"  include subj names in sam:{int(opt.sam_with_ref_header)}\n"
          f"  include seq in sam/bam:   {opt.sam_bam_seq}\n"
          f"  with subject tax ids:     {int(opt.has_s_tax_ids)}\n"
          f"  compute LCA:              {int(opt.compute_lca)}\n"
          " GENERAL\n"
          f"  threads:                  {opt.threads}\n"
          f"  query batch (device):     {opt.query_batch_size}\n"
          " TRANSLATION AND ALPHABETS\n"
          f"  domain:                   {opt.domain.value}\n"
          f"  genetic code:             {opt.genetic_code}\n"
          f"  original alphabet (query):{opt.qry_orig_alphabet}\n"
          " SEEDING\n"
          f"  seed length:              {so.seed_length}\n"
          f"  seed offset:              {so.seed_offset}\n"
          f"  seed delta:               {so.max_seed_dist}\n"
          f"  adaptive seeding:         {'on' if opt.adaptive_seeding else 'off'}\n"
          f"  pre-search:               {'on' if opt.iterative_search else 'off'}\n"
          f"  seed length0:             {so0.seed_length}\n"
          f"  seed offset0:             {so0.seed_offset}\n"
          f"  seed delta0:              {so0.max_seed_dist}\n"
          " MISCELLANEOUS HEURISTICS\n"
          f"  pre-scoring:              {'on' if opt.pre_scoring else 'off'}\n"
          f"  pre-scoring-region:       "
          f"{opt.pre_scoring * so.seed_length if opt.pre_scoring else 'n/a'}\n"
          f"  pre-scoring-threshold:    "
          f"{opt.pre_scoring_thresh if opt.pre_scoring else 'n/a'}\n"
          " SCORING\n"
          f"  scoring scheme:           {opt.scoring_method}\n"
          f"  score-match:              "
          f"{'n/a' if opt.scoring_method else opt.match}\n"
          f"  score-mismatch:           "
          f"{'n/a' if opt.scoring_method else opt.mismatch}\n"
          f"  score-gap:                {opt.gap_extend}\n"
          f"  score-gap-open:           {opt.gap_open}\n")


class IndexException(RuntimeError):
    """Problems with the database index (search_misc.hpp:32-36)."""


class QueryException(RuntimeError):
    """Problems with the query input (search_misc.hpp:38-40)."""


def strip_error_prefix(e: BaseException | str) -> str:
    """Drop a leading 'ERROR: ' so wrappers don't double the prefix."""
    msg = str(e)
    return msg[7:] if msg.startswith("ERROR: ") else msg


class _ParallelGzWriter:
    """Streaming gzip writer: buffers ~16 MB and emits each flush as a
    complete gzip member compressed by the native parallel compressor
    (multi-member gzip is valid and what pigz/bgzip readers expect).
    The threaded-compression equivalent of the reference's bio::io
    transparent_ostream threads (P6; mkindex.cpp:241).  Deterministic:
    fixed member/chunk sizes, independent of thread count."""

    MEMBER = 16 << 20

    def __init__(self, path, mode: str):
        self._fh = open(path, "wb")
        self._text = "b" not in mode
        self._buf: list = []
        self._n = 0

    def write(self, s) -> int:
        b = s.encode("utf-8") if self._text else s
        self._buf.append(b)
        self._n += len(b)
        if self._n >= self.MEMBER:
            self._flush_member()
        return len(s)

    def _flush_member(self) -> None:
        from . import native

        data = b"".join(self._buf)
        self._buf = []
        self._n = 0
        comp = native.gzip_compress(data)
        if comp is None:            # native lib unavailable mid-run
            import gzip

            comp = gzip.compress(data, 6, mtime=0)
        self._fh.write(comp)

    def flush(self) -> None:
        pass  # members are flushed by size; partial flushes would
        # make output depend on call pattern

    def close(self) -> None:
        if self._fh.closed:
            return
        self._flush_member()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def open_output(path, mode: str = "wt"):
    """Open an output file, compressing by extension (.gz / .bz2).
    .gz uses the native parallel compressor when available (P6)."""
    sp = str(path)
    if sp.endswith(".gz"):
        from . import native

        if native.get_lib() is not None:
            return _ParallelGzWriter(sp, mode)
        import gzip

        return gzip.open(sp, mode)
    if sp.endswith(".bz2"):
        import bz2

        return bz2.open(sp, mode)
    return open(sp, mode)
