"""Pipeline orchestration: stream reads -> jitted device step -> SAM out.

Reference analog: the _NGM singleton's init + thread main loop
(ref:src/NGM.cpp, SURVEY.md §3.1/§3.2).  The pthread pipeline becomes:
host streaming (io/fastq.py) feeding one bulk-synchronous jitted step per
batch (models/mapper.py), with SAM emission on the host in input order.
"""

from __future__ import annotations

import time

import numpy as np

from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.index.genome import Genome
from nextgenmap_tpu.index.kmer_index import KmerIndex
from nextgenmap_tpu.io.encode import revcomp_codes
from nextgenmap_tpu.io.fastq import ReadBatch, batch_paired, batch_single, peek_read_len
from nextgenmap_tpu.io.sam import SamWriter, open_output
from nextgenmap_tpu.models.mapper import Mapper, MapResult
from nextgenmap_tpu.utils.logging import get_logger
from nextgenmap_tpu.utils.stats import MappingStats

log = get_logger("ngm-tpu.run")


def load_reference(cfg: NgmConfig, ref_path: str):
    """Returns (genome, index) where index is None (device build), one
    KmerIndex, or a (CT, GA) pair for bisulfite mode."""
    genome = Genome.open(ref_path, skip_save=cfg.skip_save)
    # the k-mer index builds on DEVICE in seconds (index/device_build.py),
    # so unlike the reference there is nothing to memoize on the hot path; a
    # host-built artifact (ngm-tpu index verb / KmerIndex.open) is still
    # honored when present
    import os

    def try_load(collapse: str) -> KmerIndex | None:
        cache = KmerIndex.cache_path(ref_path, cfg.kmer, cfg.kmer_skip, collapse)
        if os.path.exists(cache):
            index = KmerIndex.load(cache)
            if index.genome_sha1 == genome.sha1():
                log.info("loaded k-mer index from %s", cache)
                return index
        return None

    if cfg.bs_mapping:
        ct, ga = try_load("ct"), try_load("ga")
        return genome, (ct, ga) if ct and ga else None
    return genome, try_load("none")


def emit_single(writer: SamWriter, batch: ReadBatch, res: MapResult,
                stats: MappingStats) -> None:
    """Write one single-end batch's records in input order."""
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
    stats.kmer_fanout_overflow += int(res.fanout_overflow)
    stats.cmr_overflow += int(res.cmr_overflow)
    for i in range(batch.n):
        stats.reads_in += 1
        L = int(batch.lengths[i])
        if not mapped[i]:
            stats.reads_unmapped += 1
            writer.write_unmapped(batch.names[i], batch.codes[i, :L], batch.quals[i])
            continue
        stats.reads_mapped += 1
        st = int(strand[i])
        codes = batch.codes[i, :L]
        aligned = revcomp_codes(codes) if st else codes
        no = int(n_ops[i])
        ident = float(matches[i]) / max(1, no)
        writer.write_mapped(
            batch.names[i], aligned, batch.quals[i], L, st,
            int(pos[i]), int(mapq[i]), int(score[i]),
            ops[i], no, int(q_start[i]), int(q_end[i]), ident,
        )


def run_mapping(
    cfg: NgmConfig,
    ref_path: str,
    qry: str | None = None,
    qry1: str | None = None,
    qry2: str | None = None,
    paired_interleaved: bool = False,
    out_path: str | None = None,
    cmdline: str = "",
) -> MappingStats:
    cfg.validate()
    genome, index = load_reference(cfg, ref_path)

    first_file = qry or qry1
    assert first_file, "no query reads given"
    read_len = cfg.read_len or peek_read_len(first_file)
    log.info("read length (padded): %d", read_len)

    mapper = Mapper(cfg, genome, read_len, index)
    stats = MappingStats()
    out = open_output(out_path)
    writer = SamWriter(genome, cfg, out, cmdline)
    writer.write_header()

    paired = qry1 is not None or paired_interleaved
    t0 = time.time()
    stats.start_time = t0
    if not paired:
        batches = batch_single(qry, cfg.batch_size, read_len)
        for batch in batches:
            res = mapper.map_batch(batch.codes, batch.lengths)
            emit_single(writer, batch, res, stats)
            if not cfg.no_progress:
                log.info(
                    "processed %d reads (%.0f reads/s)",
                    stats.reads_in, stats.reads_per_sec(),
                )
    else:
        from nextgenmap_tpu.pair.resolve import map_paired_batch

        src = batch_paired(qry1 or qry, qry2, cfg.batch_size, read_len)
        for batch in src:
            map_paired_batch(mapper, writer, batch, stats)
            if not cfg.no_progress:
                log.info(
                    "processed %d reads (%.0f reads/s)",
                    stats.reads_in, stats.reads_per_sec(),
                )
    if out_path not in (None, "-"):
        out.close()
    log.info("done: %s", stats.summary())
    return stats
