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
        cache = KmerIndex.cache_path(
            ref_path, cfg.kmer, cfg.kmer_skip, collapse,
            canonical=(collapse == "none"),
        )
        if os.path.exists(cache):
            index = KmerIndex.load(cache)
            if index.genome_sha1 == genome.sha1():
                log.info("loaded k-mer index from %s", cache)
                return index
        return None

    if cfg.bs_mapping:
        ct, ga = try_load("ct"), try_load("ga")
        return genome, (ct, ga) if ct and ga else None
    if cfg.index_shards > 1:
        # position-range sharding needs RAW (non-canonical) positions so the
        # global CSR can be split by range (parallel/index_shard.py); built on
        # the host and memoized like the reference's .ngm artifacts
        idx = KmerIndex.open(
            ref_path, genome.codes, genome.sha1(),
            k=cfg.kmer, skip=cfg.kmer_skip, max_freq=cfg.max_kmer_freq,
            skip_save=cfg.skip_save, canonical=False,
        )
        return genome, idx
    idx = try_load("none")
    # the device build's sort needs ~25x the genome in HBM; beyond ~256 Mbp
    # build on the host instead (memoized, like the reference's .ngm files)
    if idx is None and genome.codes.shape[0] > (1 << 28):
        log.info("large genome: building k-mer index on host (one-time)")
        idx = KmerIndex.open(
            ref_path, genome.codes, genome.sha1(),
            k=cfg.kmer, skip=cfg.kmer_skip, max_freq=cfg.max_kmer_freq,
            skip_save=cfg.skip_save,
            canonical=genome.codes.shape[0] < 2**30,
        )
    return genome, idx


def _emit_single_native(writer: SamWriter, batch: ReadBatch, res: MapResult,
                        stats: MappingStats) -> None:
    """Native-formatter batch emission (nextgenmap_tpu/native/ngmio.cpp,
    reference analog SAMWriter.cpp): one C call formats every mapped record;
    Python only interleaves the (rare) unmapped lines to keep input order."""
    from nextgenmap_tpu import native

    mapped = np.asarray(res.mapped)
    strand = np.asarray(res.strand)
    pos = np.asarray(res.pos).astype(np.int64)
    n = batch.n
    stats.kmer_fanout_overflow += int(res.fanout_overflow)
    stats.cmr_overflow += int(res.cmr_overflow)
    stats.reads_in += n
    midx = np.nonzero(mapped[:n])[0]
    stats.reads_mapped += midx.size
    stats.reads_unmapped += n - midx.size

    blob_lines: list[bytes] = []
    if midx.size:
        genome = writer.genome
        codes = batch.codes[:n]
        rc = np.where(codes < 4, 3 - codes.astype(np.int16), codes)[:, ::-1]
        aligned = np.where(
            (strand[:n] == 1)[:, None], rc, codes
        ).astype(np.uint8)
        # short reads: rc rows are left-padded after the flip; shift them
        lens = batch.lengths[:n]
        short = (lens < batch.read_len) & (strand[:n] == 1)
        for i in np.nonzero(short)[0]:
            L = int(lens[i])
            aligned[i, :L] = aligned[i, batch.read_len - L:]
            aligned[i, L:] = 4
        ci, cp = genome.abs_to_chrom(pos[midx])
        ci = np.atleast_1d(ci)
        cp = np.atleast_1d(cp)
        n_ops = np.asarray(res.n_ops)[midx]
        matches = np.asarray(res.matches)[midx]
        ident = matches.astype(np.float32) / np.maximum(1, n_ops)
        blob = native.format_sam(
            names=[batch.names[i] for i in midx],
            aligned_codes=aligned[midx],
            read_len=lens[midx],
            quals=[batch.quals[i] for i in midx],
            qual_rev=strand[midx].astype(np.uint8),
            flag=(strand[midx] * 16).astype(np.int32),
            chrom_pos=cp.astype(np.int64),
            rnames=[genome.names[int(c)] for c in ci],
            mapq=np.asarray(res.mapq)[midx],
            score=np.asarray(res.score)[midx],
            ops=np.asarray(res.ops)[midx],
            n_ops=n_ops,
            q_start=np.asarray(res.q_start)[midx],
            q_end=np.asarray(res.q_end)[midx],
            genome_codes=genome.codes,
            gpos_abs=pos[midx],
            rnexts=["*"] * midx.size,
            pnext=np.zeros(midx.size, np.int64),
            tlen=np.zeros(midx.size, np.int64),
            identity=ident,
            rg_suffix=writer._tags_suffix(),
            hard_clip=writer.cfg.hard_clip,
        )
        if midx.size == n:
            writer.out.write(blob.decode("ascii"))
            return
        blob_lines = blob.splitlines(keepends=True)

    it = iter(blob_lines)
    for i in range(n):
        if mapped[i]:
            writer.out.write(next(it).decode("ascii"))
        else:
            L = int(batch.lengths[i])
            writer.write_unmapped(batch.names[i], batch.codes[i, :L],
                                  batch.quals[i])


def emit_single(writer: SamWriter, batch: ReadBatch, res: MapResult,
                stats: MappingStats) -> None:
    """Write one single-end batch's records in input order."""
    from nextgenmap_tpu import native

    # the C formatter covers soft/hard clip rendering; --silent-clip is rare
    # enough to take the Python path
    if native.lib() is not None and not writer.cfg.silent_clip:
        return _emit_single_native(writer, batch, res, stats)
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


def emit_single_topn(writer: SamWriter, batch: ReadBatch, results: tuple,
                     stats: MappingStats, strata: bool, read_len: int) -> None:
    """Emit up to topn alignments per read; entries past the first are SAM
    secondaries (FLAG 0x100).  --strata keeps only the top-score stratum;
    near-duplicates (within a read length of a better hit) are suppressed."""
    from nextgenmap_tpu.io.sam import FLAG_SECONDARY

    cols = [
        {f: np.asarray(getattr(r, f)) for f in (
            "mapped", "strand", "pos", "mapq", "score", "ops", "n_ops",
            "q_start", "q_end", "matches",
        )} for r in results
    ]
    stats.kmer_fanout_overflow += int(results[0].fanout_overflow)
    stats.cmr_overflow += int(results[0].cmr_overflow)
    for i in range(batch.n):
        stats.reads_in += 1
        L = int(batch.lengths[i])
        if not cols[0]["mapped"][i]:
            stats.reads_unmapped += 1
            writer.write_unmapped(batch.names[i], batch.codes[i, :L], batch.quals[i])
            continue
        stats.reads_mapped += 1
        best_score = int(cols[0]["score"][i])
        emitted_pos: list[int] = []
        for j, c in enumerate(cols):
            if not c["mapped"][i]:
                break
            score = int(c["score"][i])
            if score <= 0 or (strata and score < best_score):
                break
            pos = int(c["pos"][i])
            if any(abs(pos - p) <= read_len for p in emitted_pos):
                continue  # same locus as a better alignment
            emitted_pos.append(pos)
            st = int(c["strand"][i])
            codes = batch.codes[i, :L]
            aligned = revcomp_codes(codes) if st else codes
            no = int(c["n_ops"][i])
            ident = float(c["matches"][i]) / max(1, no)
            writer.write_mapped(
                batch.names[i], aligned, batch.quals[i], L, st,
                pos, int(c["mapq"][i]) if j == 0 else 0, score,
                c["ops"][i], no, int(c["q_start"][i]), int(c["q_end"][i]),
                ident, flag_extra=0 if j == 0 else FLAG_SECONDARY,
            )


def _start_fetch(res):
    """Kick off device->host copies for every result leaf, concurrently.

    Without this, each np.asarray in the emitter is a separate synchronous
    device roundtrip (measured ~25 ms each through the axon tunnel; a PCIe
    hop on real hardware) — serialized, they dominate the steady state.
    Issued right after dispatch, the copies overlap the NEXT batch's device
    compute and each other.
    """
    import jax as _j

    for leaf in _j.tree_util.tree_leaves(res):
        try:
            leaf.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
    return res


def _prefetch(it, depth: int = 2):
    """Run a generator on a background thread, `depth` items ahead.

    Reference analog: the ReadProvider feeding worker threads
    (ref:src/ReadProvider.cpp) — here one parse thread keeps fixed-shape
    batches ready so FASTQ parsing overlaps device compute.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(DONE)
        except BaseException as e:  # surface parse errors in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def run_mapping(
    cfg: NgmConfig,
    ref_path: str,
    qry: str | None = None,
    qry1: str | None = None,
    qry2: str | None = None,
    paired_interleaved: bool = False,
    out_path: str | None = None,
    cmdline: str = "",
    resume: bool = False,
    profile_dir: str = "",
) -> MappingStats:
    """Map reads end-to-end.

    Checkpoint/resume (SURVEY.md §5.4): after every emitted batch a sidecar
    `<out>.ngmt-progress.json` records reads-emitted + a config hash; with
    resume=True a matching incomplete sidecar re-enters the input at that
    read boundary and appends to the output (mapping is per-read
    deterministic, so restart is idempotent at batch granularity).
    """
    import hashlib
    import json
    import os

    cfg.validate()
    # data-parallel mapping needs the batch divisible by 2 * n_devices
    # (pairs must not straddle device shards); normalize BEFORE the config
    # hash so resume stays consistent
    import jax as _jax

    # -- multi-host sharding (SURVEY.md §2.3/§5.8; parallel/distributed.py):
    # this process maps read batches b with b % nprocs == procid into a
    # .part file; process 0 merges parts back into input order at the end --
    dist = cfg.dist_nprocs > 1
    final_out = out_path
    if dist:
        from nextgenmap_tpu.parallel import distributed as dist_mod

        if cfg.dist_coordinator:
            dist_mod.init_distributed(
                cfg.dist_coordinator, cfg.dist_nprocs, cfg.dist_procid
            )
        if out_path in (None, "-"):
            raise ValueError("multi-host mapping requires -o <file>")
        if cfg.bam:
            raise ValueError(
                "multi-host + --bam unsupported: map to SAM shards, convert after"
            )
        if resume:
            raise ValueError("multi-host + --resume not supported (yet)")
        out_path = dist_mod.part_path(final_out, cfg.dist_procid, cfg.dist_nprocs)

    ndev = cfg.devices or len(_jax.local_devices())
    if ndev > 1:
        m = 2 * ndev
        bs = ((cfg.batch_size + m - 1) // m) * m
        if bs != cfg.batch_size:
            log.info("batch_size %d -> %d (multiple of 2 x %d devices)",
                     cfg.batch_size, bs, ndev)
            cfg = cfg.replace(batch_size=bs)
    genome, index = load_reference(cfg, ref_path)

    first_file = qry or qry1
    assert first_file, "no query reads given"
    read_len = cfg.read_len or peek_read_len(first_file)
    log.info("read length (padded): %d", read_len)

    # -- checkpoint/resume bookkeeping --
    progress_path = (
        f"{out_path}.ngmt-progress.json" if out_path not in (None, "-") else None
    )
    # the hash covers mapping SEMANTICS; the input window (qry_start/count)
    # is exactly what resume adjusts, so it must not invalidate a checkpoint
    cfg_sha = hashlib.sha1(
        cfg.replace(qry_start=0, qry_count=0).to_json().encode()
    ).hexdigest()
    skip = max(0, cfg.qry_start)
    count = max(0, cfg.qry_count)
    prior = 0
    append = False
    if resume and progress_path and os.path.exists(progress_path):
        try:
            p = json.load(open(progress_path))
        except (OSError, ValueError):
            p = {}
        if (
            p.get("config_sha") == cfg_sha
            and not p.get("complete")
            and os.path.exists(out_path)
            and not cfg.bam  # BGZF cannot be appended record-wise
        ):
            prior = int(p.get("reads_emitted", 0))
            skip += prior
            if count:
                count = max(0, count - prior)
            append = prior > 0
            # a kill mid-batch leaves partial records past the checkpoint;
            # drop them so the in-flight batch re-emits idempotently
            # (SURVEY.md §5.4)
            ob = p.get("out_bytes")
            if append and ob is not None and os.path.getsize(out_path) > ob:
                with open(out_path, "r+") as tf:
                    tf.truncate(ob)
                log.info("truncated %s to checkpointed %d bytes", out_path, ob)
            log.info("resuming after %d already-emitted reads", prior)

    def save_progress(complete: bool = False) -> None:
        if progress_path is None:
            return
        # crash consistency: the output stream is buffered, so it must hit
        # the OS before the sidecar claims its records were emitted — a
        # SIGKILL between the two would otherwise lose records that resume
        # then skips (tests/test_resume.py kill test)
        flush = getattr(out, "flush", None)
        if flush is not None:
            flush()
        try:  # byte offset of the checkpoint: resume truncates back to it
            out_bytes = getattr(out, "out", out).tell()
        except (OSError, ValueError, AttributeError):
            out_bytes = None
        tmp = progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({
                "reads_emitted": prior + stats.reads_in,
                "config_sha": cfg_sha,
                "out_bytes": out_bytes,
                "complete": complete,
            }, f)
        os.replace(tmp, progress_path)

    mapper = Mapper(cfg, genome, read_len, index)
    stats = MappingStats()
    if cfg.bam:
        from nextgenmap_tpu.io.bam import BamTextWriter

        if out_path in (None, "-"):
            raise ValueError("--bam requires -o <file>")
        out = BamTextWriter(out_path)
    else:
        out = open(out_path, "a", buffering=1 << 20) if append else open_output(out_path)
    if dist:
        from nextgenmap_tpu.parallel.distributed import CountingWriter

        out = CountingWriter(out)
    writer = SamWriter(genome, cfg, out, cmdline)
    if not append:
        writer.write_header()
    header_lines = out.lines if dist else 0
    batch_lines: list[int] = []

    def record_batch_lines() -> None:
        if dist:
            batch_lines.append(out.lines - header_lines - sum(batch_lines))

    cells_per_aln = read_len * mapper.band  # for the GCUPS counter

    def account(res, batch):
        n_aln = int(np.asarray(res.n_candidates).sum())
        stats.alignments_computed += n_aln
        stats.cells_computed += (n_aln + batch.n) * cells_per_aln

    paired = qry1 is not None or paired_interleaved
    t0 = time.time()
    stats.start_time = t0
    # tracing/profiling (SURVEY.md §5.1): the mapping loop is wrapped in a
    # jax.profiler trace viewable in Perfetto/XProf
    import jax as _jx
    if profile_dir:
        _jx.profiler.start_trace(profile_dir)
    def after_emit(res, batch):
        account(res, batch)
        record_batch_lines()
        save_progress()
        if not cfg.no_progress:
            log.info(
                "processed %d reads (%.0f reads/s, %.2f GCUPS)",
                stats.reads_in, stats.reads_per_sec(), stats.gcups(),
            )

    # software pipeline (the reference's double-buffering analog,
    # SURVEY.md §2 component 14): a parse thread keeps batches ready, and
    # batch i+1 is DISPATCHED to the device (async under JAX) before batch
    # i's results are fetched/emitted on the host — parse, device compute,
    # and SAM formatting overlap
    if not paired:
        topn = max(1, cfg.topn)
        batches = batch_single(qry, cfg.batch_size, read_len, skip, count)
        if dist:
            from nextgenmap_tpu.parallel.distributed import shard_batches

            batches = shard_batches(batches, cfg.dist_procid, cfg.dist_nprocs)

        def emit(pending):
            batch, res = pending
            if topn > 1:
                emit_single_topn(writer, batch, res, stats,
                                 cfg.strata, read_len)
                after_emit(res[0], batch)
            else:
                emit_single(writer, batch, res, stats)
                after_emit(res, batch)

        pending = None
        for batch in _prefetch(batches):
            res = _start_fetch(
                mapper.map_batch_topn(batch.codes, batch.lengths)
                if topn > 1 else mapper.map_batch(batch.codes, batch.lengths)
            )
            if pending is not None:
                emit(pending)
            pending = (batch, res)
        if pending is not None:
            emit(pending)
    else:
        from nextgenmap_tpu.pair.resolve import emit_paired

        if skip % 2 or count % 2:
            raise ValueError("paired qry-start/qry-count/resume must be even")
        batches = batch_paired(qry1 or qry, qry2, cfg.batch_size, read_len,
                               skip, count)
        if dist:
            from nextgenmap_tpu.parallel.distributed import shard_batches

            batches = shard_batches(batches, cfg.dist_procid, cfg.dist_nprocs)
        pending = None
        for batch in _prefetch(batches):
            res = _start_fetch(
                mapper.map_batch_paired(batch.codes, batch.lengths)
            )
            if pending is not None:
                pb, pr = pending
                emit_paired(writer, pb, pr, stats)
                after_emit(pr, pb)
            pending = (batch, res)
        if pending is not None:
            pb, pr = pending
            emit_paired(writer, pb, pr, stats)
            after_emit(pr, pb)
    if profile_dir:
        _jx.profiler.stop_trace()
        log.info("profiler trace written to %s", profile_dir)
    save_progress(complete=True)
    if cfg.bam or out_path not in (None, "-"):
        out.close()
    if dist:
        from nextgenmap_tpu.parallel import distributed as dist_mod

        sd = {k: v for k, v in vars(stats).items()
              if isinstance(v, (int, float)) and k != "start_time"}
        dist_mod.write_manifest(
            final_out, cfg.dist_procid, cfg.dist_nprocs,
            header_lines, batch_lines, sd, complete=True,
        )
        if cfg.dist_procid == 0 and not cfg.no_merge:
            totals = dist_mod.merge_parts(final_out, cfg.dist_nprocs)
            log.info(
                "done (all %d hosts): reads: %d  mapped: %d  unmapped: %d",
                cfg.dist_nprocs, totals.get("reads_in", 0),
                totals.get("reads_mapped", 0), totals.get("reads_unmapped", 0),
            )
            return stats
    log.info("done: %s", stats.summary())
    return stats
