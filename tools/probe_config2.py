"""Config-2-scale probe: full map_step at chr20-like density (64 Mbp, 150 bp).

Measures the fused device step the same way bench.py does (staged batches,
one timed sweep) but at BASELINE config-2 shapes, where the CS slot-ownership
compaction dominates (round-2 breakdown: CS 28.8 of 47.2 ms/batch).

Run one clean process per variant (axon executor state contaminates later
dispatches in the same process — BASELINE.md round 2):

    NGM_OWNERS=dense   python tools/probe_config2.py
    NGM_OWNERS=scatter python tools/probe_config2.py

Prints one JSON line: {"owners": ..., "ms_per_batch": ..., "reads_per_sec": ...}
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME_SIZE = int(os.environ.get("NGM_PROBE_G", 64_000_000))
READ_LEN = int(os.environ.get("NGM_PROBE_L", 150))
BATCH = int(os.environ.get("NGM_PROBE_B", 4096))
N_BATCHES = int(os.environ.get("NGM_PROBE_N", 8))
SNP_RATE = float(os.environ.get("NGM_PROBE_SNP", 0.02))
FORCE_H = int(os.environ.get("NGM_PROBE_H", 0))  # 0 = auto
STRIDE = int(os.environ.get("NGM_PROBE_STRIDE", 0))  # 0 = config default
CANON = os.environ.get("NGM_PROBE_CANON", "1") == "1"
PACKED = os.environ.get("NGM_PROBE_PACKED", "0") == "1"  # retired in prod (45 ms/batch uint32-gather tax)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
    from nextgenmap_tpu.models.mapper import map_step
    from nextgenmap_tpu.ops.candidate import _OWNERS_MODE, pack_offsets
    from nextgenmap_tpu.ops.scoring import matrices_are_simple, score_matrix

    cfg = NgmConfig()
    if STRIDE:
        cfg = cfg.replace(read_kmer_skip=STRIDE)  # H auto-resizes with Q
    if FORCE_H:
        cfg = cfg.replace(max_read_hits=FORCE_H)
    dev = jax.devices()[0]
    log(f"device: {dev.platform}  owners mode: {_OWNERS_MODE}")

    t0 = time.time()
    g = random_genome(GENOME_SIZE, seed=11)
    genome_d = jax.device_put(jnp.asarray(g))
    off_d, pos_d = build_index_device(
        genome_d, k=cfg.kmer, skip=cfg.kmer_skip, canonical=CANON
    )
    jax.block_until_ready(pos_d)
    log(f"index: {time.time()-t0:.1f}s ({pos_d.shape[0]} positions)")
    packed = (pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
              if PACKED else None)
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
        packed_offsets=packed_offsets, canonical=CANON,
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
    results = [run(b) for b in staged]
    jax.block_until_ready(results)
    dt = time.time() - t0

    # accuracy of EVERY batch: if the relay ever elides an execution, stale/
    # wrong later batches must show up here, not hide behind batch 0
    accs = []
    for b, r in enumerate(results):
        lo = b * BATCH
        p = np.asarray(r.pos)
        accs.append(int((
            np.asarray(r.mapped)
            & (np.abs(p.astype(np.int64) - truth_pos[lo:lo + BATCH]) <= 5)
            & (np.asarray(r.strand) == truth_strand[lo:lo + BATCH])
        ).sum()))
    ok = accs[0]
    n = BATCH * N_BATCHES
    log(f"truth accuracy per batch: {accs}")
    hov = sum(int(r.fanout_overflow) for r in results)
    cov = sum(int(r.cmr_overflow) for r in results)
    print(json.dumps({
        "owners": _OWNERS_MODE, "H": H,
        "canonical": CANON, "packed": packed_offsets,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
        "reads_per_sec": round(n / dt, 1),
        "acc_per_batch": accs,
        "overflows_kmer_cmr": [hov, cov],
    }))


if __name__ == "__main__":
    main()
