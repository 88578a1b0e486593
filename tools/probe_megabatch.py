"""Megabatch probe: ONE scan-over-K-batches program vs K separate dispatches.

Motivation (BASELINE.md round 2/3): on the axon tunnel, after one execution
of the fused map_step program, every subsequent dispatch in that process
pays a large fixed tax (a trivial gather goes 0.04 ms -> ~39 ms measured by
tools/probe_contamination.py).  bench.py's timed loop submits all batches
asynchronously, so dispatch latency partially pipelines — but if a fixed
per-dispatch host or executor cost remains, folding K batches into ONE
`lax.scan` program (1 dispatch per K batches) removes K-1 of them.

Run one clean process per mode:

    NGM_MB_MODE=loop      python tools/probe_megabatch.py   # K dispatches, block at end (bench.py style)
    NGM_MB_MODE=loopblock python tools/probe_megabatch.py   # K dispatches, block per call (no pipelining)
    NGM_MB_MODE=scan      python tools/probe_megabatch.py   # ONE scan program over [K,B,L]

Prints one JSON line with ms/batch and reads/s.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = os.environ.get("NGM_MB_MODE", "scan")
GENOME_SIZE = int(os.environ.get("NGM_PROBE_G", 64_000_000))
READ_LEN = int(os.environ.get("NGM_PROBE_L", 150))
BATCH = int(os.environ.get("NGM_PROBE_B", 4096))
N_BATCHES = int(os.environ.get("NGM_PROBE_N", 8))
SNP_RATE = 0.02


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
    from nextgenmap_tpu.models.mapper import map_step
    from nextgenmap_tpu.ops.candidate import pack_offsets
    from nextgenmap_tpu.ops.scoring import score_matrix

    cfg = NgmConfig()
    dev = jax.devices()[0]
    log(f"device: {dev.platform}  mode: {MODE}")

    t0 = time.time()
    g = random_genome(GENOME_SIZE, seed=11)
    genome_d = jax.device_put(jnp.asarray(g))
    off_d, pos_d = build_index_device(
        genome_d, k=cfg.kmer, skip=cfg.kmer_skip, canonical=True
    )
    jax.block_until_ready(pos_d)
    log(f"index: {time.time()-t0:.1f}s ({pos_d.shape[0]} positions)")
    packed = (pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
              if os.environ.get("NGM_PROBE_PACKED", "0") == "1" else None)
    packed_offsets = packed is not None
    if packed_offsets:
        off_d = packed

    codes, truth_pos, truth_strand = simulate_reads_fast(
        g, BATCH * N_BATCHES, read_len=READ_LEN, snp_rate=SNP_RATE, seed=12
    )
    lens_d = jnp.full((BATCH,), READ_LEN, jnp.int32)
    mats_d = jnp.asarray(np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)]))
    band = cfg.corridor_for(READ_LEN)
    H = cfg.resolved_read_hits(int(pos_d.shape[0]), READ_LEN)
    log(f"H={H} band={band}")
    statics = dict(
        k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
        max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2, band=band,
        min_kmer_hits=1, read_stride=cfg.read_kmer_skip,
        packed_offsets=packed_offsets, canonical=True,
        sw_backend=cfg.sw_backend,
        simple_matrix=True,
    )
    scal = (
        jnp.int32(cfg.gap_read_penalty), jnp.int32(cfg.gap_ref_penalty),
        jnp.int32(cfg.gap_extend_penalty), jnp.float32(cfg.sensitivity),
        jnp.int32(cfg.max_kmer_freq),
        jnp.float32(cfg.min_identity), jnp.float32(cfg.min_residues),
    )

    def run(batch_codes):
        return map_step(
            genome_d, off_d, pos_d, batch_codes, lens_d, mats_d, *scal, **statics
        )

    if MODE == "scan":
        # genome/index/scalars must be ARGUMENTS, not closed-over arrays —
        # closure constants get serialized into the compile payload (HTTP 413
        # on the tunnel's remote-compile helper at gigabase index sizes)
        @jax.jit
        def run_scan(stacked, genome, off, pos, lens, mats, *scal_args):
            def body(carry, batch_codes):
                r = map_step(
                    genome, off, pos, batch_codes, lens, mats, *scal_args,
                    **statics,
                )
                return carry, r
            _, rs = jax.lax.scan(body, 0, stacked)
            return rs

        stacked = jax.device_put(
            jnp.asarray(codes.reshape(N_BATCHES, BATCH, READ_LEN))
        )
        jax.block_until_ready(stacked)
        args = (stacked, genome_d, off_d, pos_d, lens_d, mats_d) + scal
        t0 = time.time()
        first = run_scan(*args)
        jax.block_until_ready(first)
        log(f"compile+first sweep: {time.time()-t0:.1f}s")
        t0 = time.time()
        res = run_scan(*args)
        jax.block_until_ready(res)
        dt = time.time() - t0
        r_mapped = np.asarray(res.mapped[0])
        r_pos = np.asarray(res.pos[0])
        r_strand = np.asarray(res.strand[0])
    else:
        t0 = time.time()
        first = run(jnp.asarray(codes[:BATCH]))
        jax.block_until_ready(first)
        log(f"compile+first: {time.time()-t0:.1f}s")
        staged = [
            jax.device_put(jnp.asarray(codes[b * BATCH : (b + 1) * BATCH]))
            for b in range(N_BATCHES)
        ]
        jax.block_until_ready(staged)
        t0 = time.time()
        if MODE == "loopblock":
            results = []
            for b in staged:
                r = run(b)
                jax.block_until_ready(r)
                results.append(r)
        else:
            results = [run(b) for b in staged]
            jax.block_until_ready(results)
        dt = time.time() - t0
        r_mapped = np.asarray(results[0].mapped)
        r_pos = np.asarray(results[0].pos)
        r_strand = np.asarray(results[0].strand)

    ok = int((
        r_mapped
        & (np.abs(r_pos.astype(np.int64) - truth_pos[:BATCH]) <= 5)
        & (r_strand == truth_strand[:BATCH])
    ).sum())
    n = BATCH * N_BATCHES
    log(f"truth accuracy first batch: {ok}/{BATCH}")
    print(json.dumps({
        "mode": MODE,
        "n_batches": N_BATCHES,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
        "reads_per_sec": round(n / dt, 1),
        "acc_first_batch": ok,
    }))


if __name__ == "__main__":
    main()
