"""CS sub-stage breakdown at config-2 shapes (one clean process per stage).

Round-2 attributed 28.8 of 47.2 ms/batch to "CS search" as a whole; the
round-3 owners A/B (dense 46.8 / scatter 50.7 / bisect 116.4 ms full-step)
shows the slot-ownership formulation is NOT the dominant term — this probe
splits CS itself.  Stages (NGM_CS_STAGE):

  kmer     — canonical k-mer extraction only
  compact  — extraction + offset lookups + slot compaction (_compact_hits)
  search   — the full candidate_search_canonical (adds votes/sort/top-k)
  candsel  — mapper._candidates (adds rc batch + rule-11 candidate ordering)

Prints one JSON line {"stage": ..., "ms_per_batch": ...}.
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
STAGE = os.environ.get("NGM_CS_STAGE", "search")
FORCE_H = int(os.environ.get("NGM_PROBE_H", 0))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from functools import partial

    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
    from nextgenmap_tpu.models.mapper import _candidates
    from nextgenmap_tpu.ops.candidate import (
        _compact_hits, candidate_search_canonical, pack_offsets,
    )
    from nextgenmap_tpu.ops.kmer import extract_kmers_canonical

    cfg = NgmConfig()
    t0 = time.time()
    g = random_genome(GENOME_SIZE, seed=11)
    genome_d = jax.device_put(jnp.asarray(g))
    off_d, pos_d = build_index_device(
        genome_d, k=cfg.kmer, skip=cfg.kmer_skip, canonical=True
    )
    jax.block_until_ready(pos_d)
    log(f"index: {time.time()-t0:.1f}s")
    packed = pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
    off_use = packed if packed is not None else off_d

    codes, _, _ = simulate_reads_fast(
        g, BATCH * N_BATCHES, read_len=READ_LEN, snp_rate=0.02, seed=12
    )
    lens_d = jnp.full((BATCH,), READ_LEN, jnp.int32)
    H = FORCE_H or cfg.resolved_read_hits(int(pos_d.shape[0]), READ_LEN)
    band = cfg.corridor_for(READ_LEN)
    log(f"stage={STAGE} H={H}")
    sens = jnp.float32(cfg.sensitivity)
    mf = jnp.int32(cfg.max_kmer_freq)

    # NOTE: genome/offsets/positions MUST be jit ARGUMENTS, not closures —
    # closed-over device arrays are embedded in the compile payload and the
    # sandbox's remote-compile helper rejects it (HTTP 413 length limit)
    if STAGE == "kmer":
        @jax.jit
        def _run(batch, lens):
            return extract_kmers_canonical(batch, lens, cfg.kmer,
                                           stride=cfg.read_kmer_skip)

        run = lambda b: _run(b, lens_d)
    elif STAGE == "compact":
        @jax.jit
        def _run(batch, lens, off, pos):
            canon, flip, ok = extract_kmers_canonical(
                batch, lens, cfg.kmer, stride=cfg.read_kmer_skip
            )
            return _compact_hits(
                canon, ok, off, pos, mf,
                fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
                packed_offsets=packed is not None, payload=flip,
            )

        run = lambda b: _run(b, lens_d, off_use, pos_d)
    elif STAGE == "search":
        fn = partial(
            candidate_search_canonical,
            k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
            max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2,
            stride=cfg.read_kmer_skip, packed_offsets=packed is not None,
        )

        @jax.jit
        def _run(batch, lens, off, pos):
            canon, flip, ok = extract_kmers_canonical(
                batch, lens, cfg.kmer, stride=cfg.read_kmer_skip
            )
            return fn(canon, flip, ok, lens, off, pos, sens, mf)

        run = lambda b: _run(b, lens_d, off_use, pos_d)
    elif STAGE == "candsel":
        statics = dict(
            k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
            max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2,
            band=band, min_kmer_hits=1, read_stride=cfg.read_kmer_skip,
            packed_offsets=packed is not None, canonical=True,
        )

        @jax.jit
        def _run(g_, off, pos, batch, lens):
            return _candidates(
                g_, off, pos, batch, lens, sens, mf, **statics
            )

        run = lambda b: _run(genome_d, off_use, pos_d, b, lens_d)
    else:
        raise SystemExit(f"unknown stage {STAGE}")

    first = run(jnp.asarray(codes[:BATCH]))
    jax.block_until_ready(first)
    staged = [
        jax.device_put(jnp.asarray(codes[b * BATCH: (b + 1) * BATCH]))
        for b in range(N_BATCHES)
    ]
    jax.block_until_ready(staged)
    t0 = time.time()
    out = [run(b) for b in staged]
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(json.dumps({
        "stage": STAGE, "H": H,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
