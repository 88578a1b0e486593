"""Paired-end host-side emission: FLAGs, RNEXT/PNEXT/TLEN, pair stats.

Reference analog: the pairing logic spread across ScoreBuffer /
AlignmentBuffer / SAMWriter in the reference (SURVEY.md §2 component 21).
Device-side pair *selection* lives in models/mapper.py::map_step_paired;
this module turns the per-mate results into SAM pair records.
"""

from __future__ import annotations

import numpy as np

from nextgenmap_tpu.io.encode import revcomp_codes
from nextgenmap_tpu.io.fastq import ReadBatch
from nextgenmap_tpu.io.sam import (
    FLAG_FIRST, FLAG_MATE_REVERSE, FLAG_MATE_UNMAPPED, FLAG_PAIRED,
    FLAG_PROPER, FLAG_SECOND, FLAG_REVERSE, FLAG_UNMAPPED, SamWriter,
)
from nextgenmap_tpu.models.mapper import Mapper, MapResult
from nextgenmap_tpu.ops.sw_ref import OP_I
from nextgenmap_tpu.utils.stats import MappingStats


def _ref_span(ops: np.ndarray, n_ops: int) -> int:
    """Reference bases consumed by the alignment (M + D columns)."""
    return int(np.sum(ops[:n_ops] != OP_I))


def map_paired_batch(
    mapper: Mapper, writer: SamWriter, batch: ReadBatch, stats: MappingStats
) -> MapResult:
    res = mapper.map_batch_paired(batch.codes, batch.lengths)
    emit_paired(writer, batch, res, stats)
    return res


def emit_paired(
    writer: SamWriter, batch: ReadBatch, res: MapResult, stats: MappingStats
) -> None:
    mapped = np.asarray(res.mapped)
    strand = np.asarray(res.strand)
    pos = np.asarray(res.pos)
    mapq = np.asarray(res.mapq)
    score = np.asarray(res.score)
    ops = np.asarray(res.ops)
    n_ops = np.asarray(res.n_ops)
    q_start = np.asarray(res.q_start)
    q_end = np.asarray(res.q_end)
    matches = np.asarray(res.matches)
    proper = np.asarray(res.proper)
    stats.kmer_fanout_overflow += int(res.fanout_overflow)
    stats.cmr_overflow += int(res.cmr_overflow)

    genome = writer.genome
    for p in range(batch.n // 2):
        i, j = 2 * p, 2 * p + 1
        pair_proper = bool(proper[i] and proper[j] and mapped[i] and mapped[j])
        if pair_proper:
            stats.pairs_proper += 1
        elif mapped[i] or mapped[j]:
            stats.pairs_broken += 1
        # pre-compute chrom + span for TLEN
        info = {}
        for m in (i, j):
            if mapped[m]:
                ci, cp = genome.abs_to_chrom(int(pos[m]))
                info[m] = (int(ci), int(cp), _ref_span(ops[m], int(n_ops[m])))
        for m, o, first in ((i, j, True), (j, i, False)):
            stats.reads_in += 1
            L = int(batch.lengths[m])
            flag = FLAG_PAIRED | (FLAG_FIRST if first else FLAG_SECOND)
            if mapped[o]:
                if strand[o]:
                    flag |= FLAG_MATE_REVERSE
            else:
                flag |= FLAG_MATE_UNMAPPED
            if not mapped[m]:
                stats.reads_unmapped += 1
                # SAM convention: an unmapped mate inherits its mapped
                # partner's coordinates so the pair stays collatable
                if mapped[o]:
                    co, cpo, _ = info[o]
                    writer.write_unmapped_at(
                        batch.names[m], batch.codes[m, :L], batch.quals[m],
                        flag, genome.names[co], cpo + 1,
                    )
                else:
                    writer.write_unmapped(batch.names[m], batch.codes[m, :L],
                                          batch.quals[m], flag)
                continue
            stats.reads_mapped += 1
            if pair_proper:
                flag |= FLAG_PROPER
            cm, cpm, span_m = info[m]
            rnext, pnext, tlen = "*", 0, 0
            if mapped[o]:
                co, cpo, span_o = info[o]
                rnext = "=" if co == cm else genome.names[co]
                pnext = cpo + 1
                if co == cm:
                    left = min(cpm, cpo)
                    right = max(cpm + span_m, cpo + span_o)
                    t = right - left
                    # leftmost mate gets +TLEN; tie -> first mate positive
                    if cpm < cpo or (cpm == cpo and first):
                        tlen = t
                    else:
                        tlen = -t
            st = int(strand[m])
            codes = batch.codes[m, :L]
            aligned = revcomp_codes(codes) if st else codes
            no = int(n_ops[m])
            ident = float(matches[m]) / max(1, no)
            writer.write_mapped(
                batch.names[m], aligned, batch.quals[m], L, st,
                int(pos[m]), int(mapq[m]), int(score[m]),
                ops[m], no, int(q_start[m]), int(q_end[m]), ident,
                flag_extra=flag, rnext=rnext, pnext=pnext, tlen=tlen,
            )
