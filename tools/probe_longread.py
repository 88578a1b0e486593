"""Long-read (ref ~36-1000 bp ceiling) chip probe: fused vs staged programs.

Round 2: the L=1000 FUSED map_step program crashed the sandbox's remote
compile helper (HTTP 500 at W in {120,184}).  The lever (VERDICT r3 item 5):
split the step into the existing two-phase programs (cs_cands_step +
map_step_from_cands — byte-identical to map_step by the CandState
invariant), so no single giant program is emitted.

  NGM_LR_STAGE=fused   — one map_step program (the round-2 failure case)
  NGM_LR_STAGE=staged  — cs_cands_step then map_step_from_cands(best=local)

Prints one JSON line with ms/batch + reads/s + first-batch truth accuracy.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME_SIZE = int(os.environ.get("NGM_PROBE_G", 4_600_000))
READ_LEN = int(os.environ.get("NGM_PROBE_L", 1000))
BATCH = int(os.environ.get("NGM_PROBE_B", 512))
N_BATCHES = int(os.environ.get("NGM_PROBE_N", 4))
STAGE = os.environ.get("NGM_LR_STAGE", "staged")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
    from nextgenmap_tpu.models.mapper import (
        cs_cands_step, map_step, map_step_from_cands,
    )
    from nextgenmap_tpu.ops.candidate import pack_offsets
    from nextgenmap_tpu.ops.scoring import matrices_are_simple, score_matrix

    cfg = NgmConfig()
    log(f"device: {jax.devices()[0].platform}  stage={STAGE}")
    t0 = time.time()
    g = random_genome(GENOME_SIZE, seed=21)
    genome_d = jax.device_put(jnp.asarray(g))
    off_d, pos_d = build_index_device(
        genome_d, k=cfg.kmer, skip=cfg.kmer_skip, canonical=True
    )
    jax.block_until_ready(pos_d)
    log(f"index: {time.time()-t0:.1f}s")
    packed = pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
    packed_offsets = packed is not None
    if packed_offsets:
        off_d = packed

    codes, truth_pos, truth_strand = simulate_reads_fast(
        g, BATCH * N_BATCHES, read_len=READ_LEN, snp_rate=0.02, seed=22
    )
    lens_d = jnp.full((BATCH,), READ_LEN, jnp.int32)
    mats_d = jnp.asarray(np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)]))
    band = cfg.corridor_for(READ_LEN)
    H = cfg.resolved_read_hits(int(pos_d.shape[0]), READ_LEN)
    log(f"L={READ_LEN} B={BATCH} H={H} band={band}")
    statics = dict(
        k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
        max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2, band=band,
        min_kmer_hits=1, read_stride=cfg.read_kmer_skip,
        packed_offsets=packed_offsets, canonical=True,
        sw_backend=cfg.sw_backend,
        simple_matrix=True,
    )
    gq = jnp.int32(cfg.gap_read_penalty)
    gr = jnp.int32(cfg.gap_ref_penalty)
    ge = jnp.int32(cfg.gap_extend_penalty)
    sens = jnp.float32(cfg.sensitivity)
    mf = jnp.int32(cfg.max_kmer_freq)
    mi = jnp.float32(cfg.min_identity)
    mr = jnp.float32(cfg.min_residues)

    if STAGE == "fused":
        def run(batch):
            return map_step(
                genome_d, off_d, pos_d, batch, lens_d, mats_d,
                gq, gr, ge, sens, mf, mi, mr, **statics,
            )
    else:
        def run(batch):
            c = cs_cands_step(
                genome_d, off_d, pos_d, batch, lens_d, sens, mf, **statics
            )
            return map_step_from_cands(
                genome_d, batch, lens_d, mats_d, gq, gr, ge,
                sens, mi, mr, c, c.best, **statics,
            )

    t0 = time.time()
    first = run(jnp.asarray(codes[:BATCH]))
    jax.block_until_ready(first)
    log(f"compile+first: {time.time()-t0:.1f}s")

    staged = [
        jax.device_put(jnp.asarray(codes[b * BATCH: (b + 1) * BATCH]))
        for b in range(N_BATCHES)
    ]
    jax.block_until_ready(staged)
    t0 = time.time()
    results = [run(b) for b in staged]
    jax.block_until_ready(results)
    dt = time.time() - t0

    r0 = results[0]
    p = np.asarray(r0.pos)
    ok = int((
        np.asarray(r0.mapped)
        & (np.abs(p.astype(np.int64) - truth_pos[:BATCH]) <= 5)
        & (np.asarray(r0.strand) == truth_strand[:BATCH])
    ).sum())
    print(json.dumps({
        "stage": STAGE, "read_len": READ_LEN,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
        "reads_per_sec": round(BATCH * N_BATCHES / dt, 1),
        "acc_first_batch": f"{ok}/{BATCH}",
    }))


if __name__ == "__main__":
    main()
