"""Mapping statistics and progress counters.

Reference analog: ``NGMStats`` (ref:src/NGMStats.cpp) — global counters for
reads processed, CS overflows, R/S rate, printed by a stats thread.  Here the
counters are a plain mutable dataclass updated per batch on the host; the
device step returns its overflow counters as arrays (psum-able across a mesh)
so no cap can silently lose candidates without being counted.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class MappingStats:
    reads_in: int = 0
    reads_mapped: int = 0
    reads_unmapped: int = 0
    reads_multimapped: int = 0
    pairs_proper: int = 0
    pairs_broken: int = 0
    # overflow audits (SURVEY.md §7: every static cap gets a counter)
    kmer_fanout_overflow: int = 0   # k-mer hits truncated by max_kmer_fanout
    cmr_overflow: int = 0           # candidate regions truncated by max_cmrs
    alignments_computed: int = 0
    cells_computed: int = 0         # SW DP cells (for GCUPS)
    start_time: float = field(default_factory=time.time)

    def reads_per_sec(self) -> float:
        dt = time.time() - self.start_time
        return self.reads_in / dt if dt > 0 else 0.0

    def gcups(self) -> float:
        dt = time.time() - self.start_time
        return self.cells_computed / dt / 1e9 if dt > 0 else 0.0

    def summary(self) -> str:
        total = max(1, self.reads_in)
        return (
            f"reads: {self.reads_in}  mapped: {self.reads_mapped} "
            f"({100.0 * self.reads_mapped / total:.2f}%)  "
            f"unmapped: {self.reads_unmapped}  "
            f"R/S: {self.reads_per_sec():.0f}  GCUPS: {self.gcups():.2f}  "
            f"overflows(kmer/cmr): {self.kmer_fanout_overflow}/{self.cmr_overflow}"
        )
