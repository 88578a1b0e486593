"""Per-process executor-contamination probe (BASELINE round-2 finding:
after ONE dense-[4096,256,69] execution, every later dispatch in that
process ran ~17 ms slower through the axon tunnel).

Round-3 question (VERDICT weak #2): does the PRODUCTION fused map_step —
whose CS stage contains its own dense [B, H, Qt] segment — inflict the same
tax on subsequent dispatches?  Three clean-process variants:

  NGM_CONTAM=none     baseline: time a tiny gather program only
  NGM_CONTAM=dense    known contaminator: one dense [4096,256,69] reduce
  NGM_CONTAM=mapstep  one production map_step execution (E. coli shapes)

Each prints the tiny-gather dispatch latency BEFORE and AFTER the middle
program.  If mapstep's after-latency matches dense's, every steady-state
number in BASELINE.md is quietly deflated and the CS segment must be
restructured; if it matches none's, the tax is specific to the standalone
dense program and production numbers are clean.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = os.environ.get("NGM_CONTAM", "none")


def time_gather(tbl, idxs):
    # DISTINCT inputs per call: identical repeated dispatches measure
    # impossibly fast through the axon tunnel (result dedup/caching)
    f = jax.jit(lambda t, i: t[i])
    out = f(tbl, idxs[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in idxs:
        out = f(tbl, i)
        jax.block_until_ready(out)
    return (time.time() - t0) / len(idxs) * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.arange(1 << 20, dtype=jnp.int32))
    idxs = [
        jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 20, 1 << 20, dtype=np.int32)))
        for _ in range(20)
    ]
    jax.block_until_ready(idxs)
    before = time_gather(tbl, idxs)

    if MODE == "dense":
        a = jax.device_put(jnp.ones((4096, 256, 69), jnp.int32))

        g = jax.jit(lambda x: jnp.sum(x, axis=2))
        jax.block_until_ready(g(a))
    elif MODE == "mapstep":
        from nextgenmap_tpu.config import NgmConfig
        from nextgenmap_tpu.index.device_build import build_index_device
        from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
        from nextgenmap_tpu.models.mapper import map_step
        from nextgenmap_tpu.ops.candidate import pack_offsets
        from nextgenmap_tpu.ops.scoring import score_matrix

        cfg = NgmConfig()
        g_np = random_genome(4_600_000, seed=1)
        genome_d = jax.device_put(jnp.asarray(g_np))
        off_d, pos_d = build_index_device(genome_d, k=13, skip=1,
                                          canonical=True)
        packed = pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
        if packed is not None:
            off_d = packed
        codes, _, _ = simulate_reads_fast(g_np, 4096, read_len=100,
                                          snp_rate=0.02, seed=2)
        lens = jnp.full((4096,), 100, jnp.int32)
        mats = jnp.asarray(np.stack([score_matrix(cfg, 0),
                                     score_matrix(cfg, 1)]))
        H = cfg.resolved_read_hits(int(pos_d.shape[0]), 100)
        res = map_step(
            genome_d, off_d, pos_d, jnp.asarray(codes), lens, mats,
            jnp.int32(20), jnp.int32(20), jnp.int32(20), jnp.float32(0.5),
            jnp.int32(1000), jnp.float32(0.65), jnp.float32(0.5),
            k=13, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
            max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2,
            band=cfg.corridor_for(100), min_kmer_hits=1,
            read_stride=cfg.read_kmer_skip,
            packed_offsets=packed is not None, canonical=True,
            sw_backend=cfg.sw_backend, simple_matrix=True,
        )
        jax.block_until_ready(res)

    after = time_gather(tbl, idxs)
    print(json.dumps({
        "mode": MODE,
        "gather_ms_before": round(before, 3),
        "gather_ms_after": round(after, 3),
    }))


if __name__ == "__main__":
    main()
