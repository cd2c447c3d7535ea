"""Run statistics: the hit funnel (StatsHolder port,
``/root/reference/src/search_datastructures.hpp:91-295``) plus per-phase
wall-time buckets (the always-available equivalent of the reference's
compile-time LAMBDA_MICRO_STATS timings, search_datastructures.hpp:118-130,
256-284)."""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class StatsHolder:
    hits_after_seeding: int = 0
    hits_merged: int = 0
    hits_too_short: int = 0
    hits_masked: int = 0
    hits_failed_pre_extend: int = 0
    hits_failed_percent_ident: int = 0
    hits_failed_bit_score: int = 0
    hits_failed_e_value: int = 0
    hits_abundant: int = 0
    hits_duplicate: int = 0
    hits_duplicate2: int = 0
    hits_final: int = 0
    qrys_with_hit: int = 0
    pairs: int = 0
    # TPU-specific overflow counters (fixed-budget buffers)
    cursors_overflow: int = 0
    hits_overflow: int = 0
    # extension-kernel operating point: dispatches and the alignments
    # they carried (mean rows/dispatch vs the GCUPS-vs-B curve,
    # docs/PERF.md §1)
    ext_dispatches: int = 0
    ext_dispatch_rows: int = 0
    # micro-stats: per-phase wall time (seconds)
    time_seed: float = 0.0
    time_locate: float = 0.0
    time_merge: float = 0.0
    time_extend: float = 0.0
    time_extend_trace: float = 0.0
    time_write: float = 0.0
    # micro-stats: located-seed length distribution (the reference's
    # LAMBDA_MICRO_STATS seedLengths histogram mean/stddev/max,
    # search_datastructures.hpp:118-130; adaptive elongation makes the
    # lengths vary)
    seed_len_n: int = 0
    seed_len_sum: int = 0
    seed_len_sumsq: int = 0
    seed_len_max: int = 0

    def __iadd__(self, o: "StatsHolder"):
        for f in dataclasses.fields(self):
            if f.name == "seed_len_max":
                self.seed_len_max = max(self.seed_len_max, o.seed_len_max)
            else:
                setattr(self, f.name,
                        getattr(self, f.name) + getattr(o, f.name))
        return self

    def add_seed_lens(self, sl) -> None:
        """Accumulate located-seed lengths (any integer array-like)."""
        import numpy as np

        sl = np.asarray(sl, dtype=np.int64)
        if sl.size == 0:
            return
        self.seed_len_n += int(sl.size)
        self.seed_len_sum += int(sl.sum())
        self.seed_len_sumsq += int((sl * sl).sum())
        self.seed_len_max = max(self.seed_len_max, int(sl.max()))

    @contextlib.contextmanager
    def timed(self, bucket: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            setattr(self, bucket,
                    getattr(self, bucket) + time.perf_counter() - t0)

    def print_report(self, options) -> None:
        if options.verbosity >= 2:
            rem = self.hits_after_seeding
            print("   HITS                            Remaining")
            print(f"   after Seeding               {rem:>12}")
            for label, n in [
                ("failed pre-extend test", self.hits_failed_pre_extend),
                ("failed e-value test", self.hits_failed_e_value),
                ("failed bitScore test", self.hits_failed_bit_score),
                ("failed %-identity test", self.hits_failed_percent_ident),
                ("duplicates", self.hits_duplicate),
                ("late duplicates", self.hits_duplicate2),
                ("abundant", self.hits_abundant),
            ]:
                rem -= n
                print(f" - {label:<27}{n:>12} = {rem}")
            # info lines (not part of the subtraction funnel: masked /
            # too-short count schedule-time suppressions, merged counts
            # window unions — both happen BEFORE/DURING seeding+merge, so
            # their units are not post-seeding hits; the reference
            # declares these counters but never increments them in
            # lambda3, search_datastructures.hpp:95-97)
            if self.hits_masked:
                print(f"   [masked seed starts:        {self.hits_masked}]")
            if self.hits_too_short:
                print(f"   [query frames too short:    {self.hits_too_short}]")
            if self.hits_merged:
                print(f"   [windows merged:            {self.hits_merged}]")
            if self.cursors_overflow or self.hits_overflow:
                print(f"   [buffer overflows: cursors={self.cursors_overflow} "
                      f"hits={self.hits_overflow}]")
            if self.seed_len_n:
                mean = self.seed_len_sum / self.seed_len_n
                var = max(self.seed_len_sumsq / self.seed_len_n
                          - mean * mean, 0.0)
                print(f"   [seed length: mean {mean:.1f} sd {var ** 0.5:.1f}"
                      f" max {self.seed_len_max} n {self.seed_len_n}]")
            if self.ext_dispatches:
                print(f"   [extension dispatches: {self.ext_dispatches}, "
                      f"mean alignments/dispatch "
                      f"{self.ext_dispatch_rows / self.ext_dispatches:.0f}]")
            if rem != self.hits_final:
                print("WARNING: hits don't add up")
            print("   PHASE TIMES (s)   seed={:.2f} locate={:.2f} merge={:.2f}"
                  " extend={:.2f} extendTrace={:.2f} write={:.2f}".format(
                      self.time_seed, self.time_locate, self.time_merge,
                      self.time_extend, self.time_extend_trace,
                      self.time_write))
        if options.verbosity >= 1:
            print(f"Number of total hits:                           {self.hits_final}")
            print(f"Number of Query-Subject pairs:                  {self.pairs}")
            print(f"Number of Queries with at least one valid hit:  {self.qrys_with_hit}")
