"""Read->shard SKEW regression tests (round-5 config-4 bug).

Position-sorted input (per-chromosome read files, BAM re-mapping) sends a
whole batch's reads to ONE index shard.  The round-4 compacted shard tail
gave each shard a private 2B/S row budget sized for a uniform distribution,
so a sorted batch overflowed its owning shard's budget and HALF of every
batch came back unmapped (counted in cmr_overflow, but still wrong output —
observed live on the 1.2 Gbp config-4 run).  The fix is a GLOBAL budget
(models/mapper.py::_global_shard_tail): rows are pooled across shards, so
any distribution that fits 2B total rows is exact.

Reference analog: the reference binary streams sorted SAM/BAM input through
the same pipeline as FASTQ (ref:src/NGM.cpp command dispatch), so sorted
order must never change results.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.index.kmer_index import KmerIndex
from nextgenmap_tpu.io.simulate import random_genome, simulate_pairs, simulate_reads
from nextgenmap_tpu.models.mapper import (
    map_step, map_step_paired, map_step_sharded_scan,
)
from nextgenmap_tpu.ops.scoring import score_matrix
from nextgenmap_tpu.parallel.index_shard import ShardedIndex

K = 11
CFG = NgmConfig(kmer=K)
B = 64


@pytest.fixture(scope="module")
def skew():
    g = random_genome(64_000, seed=91)
    idx = KmerIndex.build(g, k=K, skip=2, max_freq=1000)
    off, pos = idx.device_arrays()
    # EVERY read from the first quarter of the genome = shard 0's core at
    # S=4 — the position-sorted worst case for a per-shard tail budget
    reads = simulate_reads(g[:16_000], B, read_len=100, snp_rate=0.03,
                           indel_rate=0.003, seed=92)
    codes = np.stack([r.codes for r in reads])
    lens = np.full(B, 100, np.int32)
    pairs = simulate_pairs(g[:16_000], B // 2, read_len=100, insert_mean=300,
                           insert_sd=30, snp_rate=0.02, seed=93)
    pcodes = np.stack([m.codes for p in pairs for m in p])
    mats = np.stack([score_matrix(CFG, 0), score_matrix(CFG, 1)])
    statics = dict(k=K, fanout_cap=CFG.max_kmer_fanout, max_cmrs=CFG.max_cmrs,
                   diag_bin_log2=CFG.diag_bin_log2,
                   band=CFG.corridor_for(100), min_kmer_hits=1)
    halo = ShardedIndex.halo_for(CFG, 100, paired=True)
    sidx = ShardedIndex.build(idx, g, 4, halo)
    return dict(g=g, off=off, pos=pos, codes=codes, lens=lens, pcodes=pcodes,
                mats=mats, statics=statics, sidx=sidx)


def _scal():
    return (jnp.int32(20), jnp.int32(20), jnp.int32(20),
            jnp.float32(0.5), jnp.int32(1000), jnp.float32(0.65),
            jnp.float32(0.5))


def _scan(s, codes, *, compact_cap, paired=False, pair_args=()):
    sidx = s["sidx"]
    return map_step_sharded_scan(
        jnp.asarray(sidx.genome), jnp.asarray(sidx.offsets),
        jnp.asarray(sidx.positions), jnp.asarray(sidx.base),
        jnp.asarray(sidx.core_lo), jnp.asarray(sidx.core_hi),
        jnp.asarray(codes), jnp.asarray(s["lens"]), jnp.asarray(s["mats"]),
        *_scal(), *pair_args, paired=paired, read_len=100,
        compact_cap=compact_cap, **s["statics"],
    )


def test_skewed_batch_global_tail_exact(skew):
    """2B global rows cover a 100%-single-shard batch exactly: the compacted
    sharded scan equals BOTH the uncompacted scan and the unsharded step."""
    s = skew
    single = map_step(
        jnp.asarray(s["g"]), jnp.asarray(s["off"]), jnp.asarray(s["pos"]),
        jnp.asarray(s["codes"]), jnp.asarray(s["lens"]),
        jnp.asarray(s["mats"]), *_scal(), **s["statics"],
    )
    full = _scan(s, s["codes"], compact_cap=0)
    compact = _scan(s, s["codes"], compact_cap=2 * B)   # 128 < S*B = 256
    for f in ("mapped", "strand", "score", "ops", "mapq", "second"):
        assert np.array_equal(np.asarray(getattr(full, f)),
                              np.asarray(getattr(compact, f))), f
    assert np.array_equal(np.asarray(full.pos), np.asarray(compact.pos))
    # vs the unsharded step (pos is uint32 global out of the merge)
    assert np.array_equal(np.asarray(single.mapped), np.asarray(compact.mapped))
    assert np.array_equal(np.asarray(single.pos),
                          np.asarray(compact.pos).astype(np.int64))
    assert np.array_equal(np.asarray(single.score), np.asarray(compact.score))
    assert int(compact.cmr_overflow) == int(single.cmr_overflow)
    # the point of the regression: nothing silently unmapped
    assert int(np.asarray(compact.mapped).sum()) \
        == int(np.asarray(single.mapped).sum())


def test_skewed_pairs_global_tail_exact(skew):
    s = skew
    pair_args = (jnp.int32(0), jnp.int32(1000), jnp.float32(0.9))
    full = _scan(s, s["pcodes"], compact_cap=0, paired=True,
                 pair_args=pair_args)
    compact = _scan(s, s["pcodes"], compact_cap=2 * B, paired=True,
                    pair_args=pair_args)
    for f in ("mapped", "pos", "strand", "score", "proper", "mapq"):
        assert np.array_equal(np.asarray(getattr(full, f)),
                              np.asarray(getattr(compact, f))), f


def test_budget_overflow_is_loud(skew):
    """A too-small global budget must COUNT every dropped group, never fail
    silently."""
    s = skew
    full = _scan(s, s["codes"], compact_cap=0)
    tiny = _scan(s, s["codes"], compact_cap=32)         # < ~64 kept groups
    lost_mapped = (int(np.asarray(full.mapped).sum())
                   - int(np.asarray(tiny.mapped).sum()))
    assert lost_mapped > 0
    assert int(tiny.cmr_overflow) - int(full.cmr_overflow) >= lost_mapped
