"""The flagship model: one jitted end-to-end mapping step.

Reference analog: the whole per-read hot path of SURVEY.md §3.2 — CS task ->
ScoreBuffer/BatchScore -> top-n -> AlignmentBuffer/BatchAlign -> filters —
which the reference spreads over pthread workers and device batch buffers
(ref:src/CS.cpp, ref:src/ScoreBuffer.cpp, ref:src/AlignmentBuffer.cpp).

TPU-native shape (SURVEY.md §7 design stance): the four stages are fused into
ONE bulk-synchronous jitted step over a `[B, L]` read batch:

  rc -> candidate search (both strands) -> corridor gather ->
  banded-SW score over all candidates -> deterministic best/second select ->
  banded-SW traceback on the winner -> filters + MAPQ

All shapes are static (caps + masks); overflow counters come back with the
results.  The same function is what `__graft_entry__.entry()` exposes and
what `parallel/` shards over a device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.index.genome import Genome
from nextgenmap_tpu.index.kmer_index import KmerIndex
from nextgenmap_tpu.ops.candidate import (
    SENTINEL, candidate_search, merge_strand_candidates,
)
from nextgenmap_tpu.ops.kmer import extract_kmers
from nextgenmap_tpu.ops.scoring import score_matrix
from nextgenmap_tpu.ops.sw_ref import banded_sw_align, banded_sw_score


class MapResult(NamedTuple):
    """Per-read mapping outcome (all arrays [B] unless noted)."""

    mapped: jax.Array      # bool
    strand: jax.Array      # int32 0 fwd / 1 rev
    pos: jax.Array         # int32 absolute genome position of first aligned base
    mapq: jax.Array        # int32 0..60
    score: jax.Array       # int32 best SW score
    second: jax.Array      # int32 second-best (different locus) SW score
    q_start: jax.Array     # int32 first aligned base in ALIGNED orientation
    q_end: jax.Array       # int32 last aligned base (inclusive)
    ops: jax.Array         # [B, MO] uint8 traceback ops END->START
    n_ops: jax.Array       # int32
    matches: jax.Array     # int32
    mismatches: jax.Array  # int32
    indels: jax.Array      # int32
    n_candidates: jax.Array  # int32 CMRs scored for this read
    fanout_overflow: jax.Array  # [] int32
    cmr_overflow: jax.Array     # [] int32


def revcomp_batch(codes: jax.Array) -> jax.Array:
    """[B, L] reverse complement on device (PAD rows stay PAD)."""
    flipped = codes[:, ::-1].astype(jnp.int32)
    return jnp.where(flipped < 4, 3 - flipped, flipped).astype(codes.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "k", "fanout_cap", "max_cmrs", "diag_bin_log2", "band", "min_kmer_hits",
    ),
)
def map_step(
    genome: jax.Array,     # [G] uint8
    offsets: jax.Array,    # [4^k+1] int32
    positions: jax.Array,  # [P] int32
    reads: jax.Array,      # [B, L] uint8
    lengths: jax.Array,    # [B] int32
    matrices: jax.Array,   # [2, 8, 8] int32 (fwd-strand, rev-strand)
    gopen_q: jax.Array,
    gopen_r: jax.Array,
    gext: jax.Array,
    sensitivity: jax.Array,   # float32 scalar
    min_identity: jax.Array,  # float32 scalar
    min_residues: jax.Array,  # float32 scalar
    *,
    k: int,
    fanout_cap: int,
    max_cmrs: int,
    diag_bin_log2: int,
    band: int,
    min_kmer_hits: int = 1,
) -> MapResult:
    B, L = reads.shape
    W = band
    T = L + W
    C = max_cmrs
    G = genome.shape[0]
    bin_w = 1 << diag_bin_log2

    # ---- candidate search on both strands (DESIGN.md rules 1-8) ----
    rc = revcomp_batch(reads)
    km_f, ok_f = extract_kmers(reads, lengths, k)
    # the rc flip moves right-padding to the front for reads shorter than L;
    # shift each rc row left by (L - length) so rc reads start at column 0
    shift = (L - lengths)[:, None]
    idx = jnp.arange(L)[None, :] + shift
    rc = jnp.take_along_axis(
        jnp.pad(rc, ((0, 0), (0, L)), constant_values=4), idx, axis=1
    )
    km_r, ok_r = extract_kmers(rc, lengths, k)

    cand_f = candidate_search(
        km_f, ok_f, offsets, positions, sensitivity,
        fanout_cap=fanout_cap, max_cmrs=max_cmrs, diag_bin_log2=diag_bin_log2,
    )
    cand_r = candidate_search(
        km_r, ok_r, offsets, positions, sensitivity,
        fanout_cap=fanout_cap, max_cmrs=max_cmrs, diag_bin_log2=diag_bin_log2,
    )
    bucket, cs_score, strand = merge_strand_candidates(cand_f, cand_r, C)
    cand_valid = cs_score >= max(1, min_kmer_hits)

    # ---- corridor gather (ref: SequenceProvider corridor extraction) ----
    slack = (W - 2 * bin_w) // 2
    corr_start = jnp.where(
        cand_valid, (bucket << diag_bin_log2) - slack, 0
    ).astype(jnp.int32)
    corr_start = jnp.clip(corr_start, 0, max(0, G - T))
    gidx = corr_start[:, :, None] + jnp.arange(T, dtype=jnp.int32)[None, None, :]
    corridors = genome[jnp.clip(gidx, 0, G - 1)]          # [B, C, T]
    corridors = jnp.where(cand_valid[:, :, None], corridors, 4)

    # ---- score every candidate (ref: IAlignment::BatchScore) ----
    q_by_strand = jnp.stack([reads, rc], axis=1)          # [B, 2, L]
    qcand = jnp.take_along_axis(
        q_by_strand, strand[:, :, None], axis=1
    )                                                      # [B, C, L]
    flatB = B * C
    sres = banded_sw_score(
        qcand.reshape(flatB, L),
        jnp.repeat(lengths, C),
        corridors.reshape(flatB, T),
        matrices,
        gopen_q, gopen_r, gext,
        strand.reshape(flatB),
        band=W,
    )
    sw = jnp.where(cand_valid, sres.score.reshape(B, C), 0)

    # ---- deterministic selection (DESIGN.md rule 11) ----
    # reorder candidates by (strand asc, corridor_start asc) so stable top_k
    # tie-breaks = score DESC, fwd first, position ASC
    order_key = strand * (2**30) + corr_start
    order_key = jnp.where(cand_valid, order_key, 2**31 - 1)
    order = jnp.argsort(order_key, axis=1)
    sw_o = jnp.take_along_axis(sw, order, axis=1)
    start_o = jnp.take_along_axis(corr_start, order, axis=1)
    strand_o = jnp.take_along_axis(strand, order, axis=1)

    s1 = jnp.max(sw_o, axis=1)
    a1 = jnp.argmax(sw_o, axis=1)                          # first max = rule 11
    best_start = jnp.take_along_axis(start_o, a1[:, None], axis=1)[:, 0]
    best_strand = jnp.take_along_axis(strand_o, a1[:, None], axis=1)[:, 0]
    # second best at a DIFFERENT locus (outside ±L of the winner) for MAPQ
    far = jnp.abs(start_o - best_start[:, None]) > L
    s2 = jnp.max(jnp.where(far, sw_o, 0), axis=1)

    # ---- traceback on the winner (ref: IAlignment::BatchAlign) ----
    bsel = a1[:, None]
    best_corr = jnp.take_along_axis(
        jnp.take_along_axis(corridors, order[:, :, None], axis=1),
        bsel[:, :, None], axis=1,
    )[:, 0]                                                # [B, T]
    best_query = jnp.take_along_axis(
        jnp.take_along_axis(qcand, order[:, :, None], axis=1),
        bsel[:, :, None], axis=1,
    )[:, 0]                                                # [B, L]
    ares = banded_sw_align(
        best_query, lengths, best_corr, matrices,
        gopen_q, gopen_r, gext, best_strand,
        band=W,
    )

    # ---- filters + MAPQ (DESIGN.md rule 12) ----
    aln_cols = jnp.maximum(1, ares.n_ops)
    identity = ares.matches.astype(jnp.float32) / aln_cols.astype(jnp.float32)
    residues = (ares.q_end - ares.q_start + 1).astype(jnp.float32)
    min_res_abs = min_residues * lengths.astype(jnp.float32)
    mapped = (
        (s1 > 0)
        & (lengths > 0)
        & (identity >= min_identity)
        & (residues >= min_res_abs)
    )
    s1f = jnp.maximum(1, s1).astype(jnp.float32)
    mapq = jnp.clip(
        jnp.round(60.0 * (s1 - s2).astype(jnp.float32) / s1f), 0, 60
    ).astype(jnp.int32)
    mapq = jnp.where(mapped, mapq, 0)

    pos_abs = best_start + ares.r_start
    n_cands = jnp.sum(cand_valid.astype(jnp.int32), axis=1)

    return MapResult(
        mapped=mapped,
        strand=best_strand,
        pos=jnp.where(mapped, pos_abs, 0),
        mapq=mapq,
        score=s1,
        second=s2,
        q_start=ares.q_start,
        q_end=ares.q_end,
        ops=ares.ops,
        n_ops=ares.n_ops,
        matches=ares.matches,
        mismatches=ares.mismatches,
        indels=ares.indels,
        n_candidates=n_cands,
        fanout_overflow=cand_f.fanout_overflow + cand_r.fanout_overflow,
        cmr_overflow=cand_f.cmr_overflow + cand_r.cmr_overflow,
    )


@dataclass
class Mapper:
    """Host-side handle: owns device-resident genome + index and the jitted step."""

    cfg: NgmConfig
    genome: Genome
    index: KmerIndex
    read_len: int

    def __post_init__(self):
        off, pos = self.index.device_arrays()
        self._genome_dev = jax.device_put(jnp.asarray(self.genome.codes))
        self._off_dev = jax.device_put(jnp.asarray(off))
        self._pos_dev = jax.device_put(jnp.asarray(pos))
        self._matrices = jnp.asarray(
            np.stack([score_matrix(self.cfg, 0), score_matrix(self.cfg, 1)])
        )
        self.band = self.cfg.corridor_for(self.read_len)

    def map_batch(self, codes: np.ndarray, lengths: np.ndarray) -> MapResult:
        cfg = self.cfg
        return map_step(
            self._genome_dev, self._off_dev, self._pos_dev,
            jnp.asarray(codes), jnp.asarray(lengths, jnp.int32),
            self._matrices,
            jnp.int32(cfg.gap_read_penalty), jnp.int32(cfg.gap_ref_penalty),
            jnp.int32(cfg.gap_extend_penalty),
            jnp.float32(cfg.sensitivity),
            jnp.float32(cfg.min_identity), jnp.float32(cfg.min_residues),
            k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, max_cmrs=cfg.max_cmrs,
            diag_bin_log2=cfg.diag_bin_log2, band=self.band,
            min_kmer_hits=max(1, cfg.kmer_min),
        )
