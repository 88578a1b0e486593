"""Candidate search (CS) — jitted, batched, fixed-shape.

Reference analog: the CS task (ref:src/CS.cpp): per read, look every k-mer up
in the index, bin the returned reference positions by diagonal
(refPos − readOffset) into a counting hash table ("CSSearchTable"), and keep
regions whose hit count clears an adaptive threshold relative to the best
region (scaled by --sensitivity) as Candidate Mapping Regions.

TPU-native design (DESIGN.md rules 1-8): instead of a per-thread hash table
with staleness tags, the whole batch is processed as dense tensors:

  1. CSR gather: positions for every (read, kmer) with a static fan-out cap K.
  2. Diagonal quantization into buckets of 2^diag_bin_log2 bases.
  3. Per-read ascending sort of all Q*K buckets (XLA bitonic sort) followed by
     vectorized run-length counting — this replaces the scatter/hash-probe
     loop, which would serialize on TPU.
  4. Pair-merged bucket score (bucket b + bucket b+1) so loci split across a
     bin boundary still count fully.
  5. Adaptive threshold max(1, ceil(best * sensitivity)) and stable top-C
     selection (ties: smaller bucket first, because the array is sorted by
     bucket and XLA top_k prefers the lowest index).

Every static cap reports an overflow count so lost candidates are auditable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

SENTINEL = jnp.int32(2**31 - 1)  # bucket value for invalid hits; sorts last


class Candidates(NamedTuple):
    bucket: jax.Array          # [B, C] int32 diagonal bucket (SENTINEL = none)
    score: jax.Array           # [B, C] int32 pair-merged hit count (0 = none)
    best_score: jax.Array      # [B] int32 best bucket score for the read
    fanout_overflow: jax.Array  # [] int32 — k-mer lookups truncated by K
    cmr_overflow: jax.Array     # [] int32 — reads with > C surviving CMRs


def _cummax(x, axis):
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis)


def _cummin_rev(x, axis):
    return jax.lax.associative_scan(jnp.minimum, x, axis=axis, reverse=True)


@partial(
    jax.jit, static_argnames=("fanout_cap", "max_cmrs", "diag_bin_log2", "axis_name")
)
def candidate_search(
    kmers: jax.Array,        # [B, Q] int32 k-mer values
    kvalid: jax.Array,       # [B, Q] bool
    offsets: jax.Array,      # [4^k + 1] int32 CSR offsets (device-resident)
    positions: jax.Array,    # [P] int32 genome positions (device-resident)
    sensitivity: jax.Array,  # scalar float32
    max_freq: jax.Array,     # scalar int32: repeat mask applied at lookup time
                             # (no-op for host-built indexes, which drop
                             # over-frequent rows at build; required for the
                             # device-built index, see index/device_build.py)
    *,
    fanout_cap: int,
    max_cmrs: int,
    diag_bin_log2: int,
    axis_name: str | None = None,
) -> Candidates:
    B, Q = kmers.shape
    K = fanout_cap
    C = max_cmrs

    km = jnp.where(kvalid, kmers, 0)
    start = offsets[km]                      # [B, Q]
    cnt = offsets[km + 1] - start            # [B, Q]
    cnt = jnp.where(cnt > max_freq, 0, cnt)  # repeat masking (lookup-time)
    fanout_overflow = jnp.sum(jnp.where(kvalid, (cnt > K).astype(jnp.int32), 0))
    cnt_c = jnp.minimum(cnt, K)

    # gather the first K positions of each CSR row (rows are sorted ascending)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Q, K), 2)
    gidx = start[:, :, None] + lane
    hit_ok = (lane < cnt_c[:, :, None]) & kvalid[:, :, None]
    gidx = jnp.where(hit_ok, gidx, 0)
    pos = positions[gidx]                    # [B, Q, K]

    # diagonal = ref position − read offset of the k-mer (stride handled by
    # caller passing kmers enumerated at stride 1; see ops/kmer.py)
    qoff = jax.lax.broadcasted_iota(jnp.int32, (B, Q, K), 1)
    diag = pos - qoff
    bucket = jnp.where(hit_ok, diag >> diag_bin_log2, SENTINEL)

    # per-read ascending sort of all hits' buckets
    N = Q * K
    s = jnp.sort(bucket.reshape(B, N), axis=-1)   # [B, N]

    ar = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), s[:, :-1]], axis=1)
    nxt = jnp.concatenate([s[:, 1:], jnp.full((B, 1), SENTINEL - 1, jnp.int32)], axis=1)
    is_start = s != prev
    is_end = s != nxt
    start_idx = _cummax(jnp.where(is_start, ar, 0), axis=1)
    end_idx = _cummin_rev(jnp.where(is_end, ar, N - 1), axis=1)
    count = end_idx - start_idx + 1               # run length at every element

    # pair-merge with the next bucket (b+1): its run starts at end_idx + 1
    nb_idx = jnp.minimum(end_idx + 1, N - 1)
    nb_bucket = jnp.take_along_axis(s, nb_idx, axis=1)
    nb_count = jnp.take_along_axis(count, nb_idx, axis=1)
    merged = count + jnp.where(nb_bucket == s + 1, nb_count, 0)

    # candidate key: merged score at run starts of real buckets, else 0
    key = jnp.where(is_start & (s != SENTINEL), merged, 0)

    best = jnp.max(key, axis=1)                   # [B]
    # under index sharding the adaptive threshold must be relative to the
    # GLOBAL best bucket score, or shard count changes the candidate set
    # (DESIGN.md rule 15); axis_name names the index-shard mesh axis
    best_thr = jax.lax.pmax(best, axis_name) if axis_name else best
    thresh = jnp.maximum(
        1, jnp.ceil(best_thr.astype(jnp.float32) * sensitivity)
    ).astype(jnp.int32)
    eligible = key >= thresh[:, None]
    n_cands = jnp.sum(eligible, axis=1)
    cmr_overflow = jnp.sum((n_cands > C).astype(jnp.int32))

    sel_key = jnp.where(eligible, key, 0)
    top_score, top_idx = jax.lax.top_k(sel_key, C)  # stable: ties → lower index → smaller bucket
    top_bucket = jnp.take_along_axis(s, top_idx, axis=1)
    top_bucket = jnp.where(top_score > 0, top_bucket, SENTINEL)

    return Candidates(
        bucket=top_bucket,
        score=top_score,
        best_score=best,
        fanout_overflow=fanout_overflow,
        cmr_overflow=cmr_overflow,
    )


def merge_strand_candidates(fwd: Candidates, rev: Candidates, max_cmrs: int):
    """Merge forward/reverse candidate lists under DESIGN.md rule 7.

    Returns (bucket [B, C], score [B, C], strand [B, C] int32 0/1).
    Concatenation order [fwd, rev] + stable top_k gives: score DESC, then
    forward strand first, then smaller bucket (each input list is already
    score-DESC / bucket-ASC).
    """
    C = max_cmrs
    bucket = jnp.concatenate([fwd.bucket, rev.bucket], axis=1)
    score = jnp.concatenate([fwd.score, rev.score], axis=1)
    strand = jnp.concatenate(
        [jnp.zeros_like(fwd.score), jnp.ones_like(rev.score)], axis=1
    )
    top_score, idx = jax.lax.top_k(score, C)
    top_bucket = jnp.take_along_axis(bucket, idx, axis=1)
    top_strand = jnp.take_along_axis(strand, idx, axis=1)
    top_bucket = jnp.where(top_score > 0, top_bucket, SENTINEL)
    top_strand = jnp.where(top_score > 0, top_strand, 0)
    return top_bucket, top_score, top_strand
