"""TRUE device-time per stage: one dispatch, K in-program executions.

The cumulative staged-program breakdown (BASELINE round 3) timed each stage
as its own dispatched program, so per-dispatch executor/tunnel latency rode
every row.  probe_megabatch proved the fused step's pipelined per-batch time
equals its scan-of-8 time (43.9 ms at config-2), i.e. the step is device-
bound — but the STAGE attribution still came from dispatched programs.
Here each stage runs as a lax.scan over K distinct batches inside ONE
program, so the per-batch figure is pure device time.

    NGM_STAGE=kmers|lookup|owners|csq|cs|full  python tools/probe_stage_scan.py

  kmers : canonical k-mer extraction only
  lookup: kmers + CSR offset gather + cnt/cum prefix sum (owners DCE'd)
  owners: lookup + slot-ownership resolve (position gather DCE'd)
  gather: owners + the [B,H] position gather (votes/select DCE'd)
  csq   : lookup + compaction incl. the [B,H] position gather (select DCE'd)
  cs    : full candidate search (lookup + compaction + votes + select)
  full  : the whole map_step

Subtraction attributes the csq wall: owners-lookup = slot ownership,
csq-owners = position gather, cs-csq = votes+sort+select.

Prints one JSON line with ms/batch (device) for the stage.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = os.environ.get("NGM_STAGE", "cs")
GENOME_SIZE = int(os.environ.get("NGM_PROBE_G", 64_000_000))
READ_LEN = int(os.environ.get("NGM_PROBE_L", 150))
BATCH = int(os.environ.get("NGM_PROBE_B", 4096))
N_BATCHES = int(os.environ.get("NGM_PROBE_N", 8))
FORCE_H = int(os.environ.get("NGM_PROBE_H", 0))
STRIDE = int(os.environ.get("NGM_PROBE_STRIDE", 0))  # 0 = config default


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast
    from nextgenmap_tpu.models.mapper import _candidates, map_step
    from nextgenmap_tpu.ops.candidate import pack_offsets
    from nextgenmap_tpu.ops.kmer import extract_kmers_canonical
    from nextgenmap_tpu.ops.scoring import score_matrix

    cfg = NgmConfig()
    if STRIDE:
        cfg = cfg.replace(read_kmer_skip=STRIDE)  # H auto-resizes with Q
    if FORCE_H:
        cfg = cfg.replace(max_read_hits=FORCE_H)
    log(f"device: {jax.devices()[0].platform}  stage: {STAGE}"
        f"  stride={cfg.read_kmer_skip}")

    g = random_genome(GENOME_SIZE, seed=11)
    genome_d = jax.device_put(jnp.asarray(g))
    off_d, pos_d = build_index_device(
        genome_d, k=cfg.kmer, skip=cfg.kmer_skip, canonical=True
    )
    jax.block_until_ready(pos_d)
    packed = (pack_offsets(off_d, cfg.max_kmer_freq, cfg.max_kmer_fanout)
              if os.environ.get("NGM_PROBE_PACKED", "0") == "1" else None)
    packed_offsets = packed is not None
    if packed_offsets:
        off_d = packed

    # 2x batches: warm on the first half, time on the second (the tunnel can
    # result-cache an identical (program, inputs) re-dispatch)
    codes, _, _ = simulate_reads_fast(
        g, BATCH * N_BATCHES * 2, read_len=READ_LEN, snp_rate=0.02, seed=12
    )
    lens_d = jnp.full((BATCH,), READ_LEN, jnp.int32)
    mats_d = jnp.asarray(np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)]))
    band = cfg.corridor_for(READ_LEN)
    H = cfg.resolved_read_hits(int(pos_d.shape[0]), READ_LEN)
    WC = 0
    if os.environ.get("NGM_WORD_GATHER", "1") != "0":
        from nextgenmap_tpu.ops.candidate import pad_positions8

        WC = cfg.resolved_word_cap(int(pos_d.shape[0]), READ_LEN, H)
        pos_d = pad_positions8(pos_d)
    log(f"H={H} band={band} WC={WC}")
    statics = dict(
        k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
        max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2, band=band,
        min_kmer_hits=1, read_stride=cfg.read_kmer_skip,
        packed_offsets=packed_offsets, canonical=True, word_cap=WC,
    )
    sens = jnp.float32(cfg.sensitivity)
    mf = jnp.int32(cfg.max_kmer_freq)

    # every stage folds to ONE int32: the relay charges a full round-trip
    # PER FETCHED LEAF (~20 ms), so stages returning different leaf counts
    # would not subtract cleanly
    def stage_kmers(reads):
        c, f, ok = extract_kmers_canonical(
            reads, lens_d, cfg.kmer, stride=cfg.read_kmer_skip
        )
        # fold so nothing is DCE'd
        return jnp.sum(c & 0xFF) + jnp.sum(f) + jnp.sum(ok)

    # genome/index tables must be ARGUMENTS of the jitted scan, not closure
    # captures — captured arrays serialize into the remote-compile payload
    # (HTTP 413 at these table sizes)
    def stage_cs(g, off, pos, reads):
        out = _candidates(
            g, off, pos, reads, lens_d, sens, mf, **statics
        )
        corr, strand, valid, score, n, rc, best, ovf, extra = out
        return (jnp.sum(corr & 0xFF) + jnp.sum(strand) + jnp.sum(n)
                + jnp.sum(best))

    def stage_csq(g, off, pos, reads):
        from nextgenmap_tpu.ops.candidate import _compact_hits
        canon, flip, ok = extract_kmers_canonical(
            reads, lens_d, cfg.kmer, stride=cfg.read_kmer_skip
        )
        pos_e, qid, valid, fo, ho, yflip = _compact_hits(
            canon, ok, off, pos, mf,
            fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
            packed_offsets=packed_offsets, payload=flip, word_cap=WC,
        )
        return (jnp.sum(pos_e & 0xFF) + jnp.sum(qid & 0xFF)
                + jnp.sum(valid) + fo + ho)

    def _lookup(off, reads):
        # the front of _compact_hits: kmers + offset gather + prefix sum
        from nextgenmap_tpu.ops.candidate import PACK_CNT_BITS
        canon, flip, ok = extract_kmers_canonical(
            reads, lens_d, cfg.kmer, stride=cfg.read_kmer_skip
        )
        K = cfg.max_kmer_fanout
        kmw = jnp.where(ok, canon, 0)
        if packed_offsets:
            pw = off[kmw]
            o0 = (pw >> PACK_CNT_BITS).astype(jnp.int32)
            cnt = jnp.where(
                ok, (pw & ((1 << PACK_CNT_BITS) - 1)).astype(jnp.int32), 0
            )
        else:
            o0 = off[kmw]
            o1 = off[kmw + 1]
            cnt = jnp.where(ok, o1 - o0, 0)
            cnt = jnp.where(cnt > mf, 0, cnt)
        cnt_c = jnp.minimum(cnt, K)
        cum = jnp.cumsum(cnt_c, axis=1) - cnt_c
        return cum, o0, cnt_c, flip

    def stage_lookup(g, off, pos, reads):
        cum, o0, cnt_c, flip = _lookup(off, reads)
        return jnp.sum(cum & 0xFF) + jnp.sum(o0 & 0xFF) + jnp.sum(cnt_c)

    def stage_owners(g, off, pos, reads):
        from nextgenmap_tpu.ops.candidate import _slot_owners
        cum, o0, cnt_c, flip = _lookup(off, reads)
        qid, pidx, pay = _slot_owners(cum, o0, flip, H, cnt_c)
        return jnp.sum(qid & 0xFF) + jnp.sum(pidx & 0xFF) + jnp.sum(pay)

    def stage_gather(g, off, pos, reads):
        # owners + the [B, H] position gather (diag/votes/select DCE'd):
        # csq minus this stage isolates nothing; this stage minus owners
        # isolates the ONE flat element gather — the round-4 wall
        from nextgenmap_tpu.ops.candidate import _slot_owners
        cum, o0, cnt_c, flip = _lookup(off, reads)
        qid, pidx, pay = _slot_owners(cum, o0, flip, H, cnt_c)
        harange = jax.lax.broadcasted_iota(jnp.int32, pidx.shape, 1)
        total = cum[:, -1] + cnt_c[:, -1]
        valid = harange < jnp.minimum(total, H)[:, None]
        pos_e = pos[jnp.where(valid, pidx, 0)]
        return jnp.sum(pos_e & 0xFF) + jnp.sum(qid & 0xFF) + jnp.sum(pay)

    def stage_wown(g, off, pos, reads):
        # lookup + BOTH ownership passes of the word path (gather DCE'd)
        from nextgenmap_tpu.ops.candidate import (
            _slot_owners_dense, _slot_owners_dense2,
        )
        cum, o0, cnt_c, flip = _lookup(off, reads)
        w0 = o0 >> 3
        wlast = (o0 + jnp.maximum(cnt_c, 1) - 1) >> 3
        wcnt = jnp.where(cnt_c > 0, wlast - w0 + 1, 0)
        cumw = jnp.cumsum(wcnt, axis=1) - wcnt
        _, widx, _ = _slot_owners_dense2(cumw, w0, None, WC)
        qid, pidx, pay, (dw_at,) = _slot_owners_dense(
            cum, o0, flip, H, extras=(cumw - w0,)
        )
        return (jnp.sum(widx & 0xFF) + jnp.sum(qid & 0xFF)
                + jnp.sum(pidx & 0xFF) + jnp.sum(dw_at & 0xFF))

    def stage_wgather(g, off, pos, reads):
        # wown + the [B, HW] row gather (compaction einsum DCE'd)
        from nextgenmap_tpu.ops.candidate import (
            _slot_owners_dense, _slot_owners_dense2,
        )
        cum, o0, cnt_c, flip = _lookup(off, reads)
        w0 = o0 >> 3
        wlast = (o0 + jnp.maximum(cnt_c, 1) - 1) >> 3
        wcnt = jnp.where(cnt_c > 0, wlast - w0 + 1, 0)
        cumw = jnp.cumsum(wcnt, axis=1) - wcnt
        totalw = cumw[:, -1] + wcnt[:, -1]
        _, widx, _ = _slot_owners_dense2(cumw, w0, None, WC)
        warange = jax.lax.broadcasted_iota(jnp.int32, widx.shape, 1)
        wvalid = warange < jnp.minimum(totalw, WC)[:, None]
        widx_c = jnp.where(wvalid, widx, 0)
        if os.environ.get("NGM_WGFLAT", "0") == "1":
            # flatten the [B, HW] descriptor grid to [B*HW]: tests whether
            # the 2D-batched index shape is what doubles the per-row cost
            B_, HW_ = widx_c.shape
            words = pos.reshape(-1, 8)[widx_c.reshape(-1)].reshape(B_, HW_, 8)
        else:
            words = pos.reshape(-1, 8)[widx_c]
        qid, pidx, pay, (dw_at,) = _slot_owners_dense(
            cum, o0, flip, H, extras=(cumw - w0,)
        )
        return (jnp.sum(words & 0xFF) + jnp.sum(qid & 0xFF)
                + jnp.sum(pidx & 0xFF) + jnp.sum(dw_at & 0xFF))

    def stage_full(g, off, pos, reads):
        r = map_step(
            g, off, pos, reads, lens_d, mats_d,
            jnp.int32(cfg.gap_read_penalty), jnp.int32(cfg.gap_ref_penalty),
            jnp.int32(cfg.gap_extend_penalty), sens, mf,
            jnp.float32(cfg.min_identity), jnp.float32(cfg.min_residues),
            **statics, sw_backend=cfg.sw_backend, simple_matrix=True,
        )
        return jnp.sum(r.pos & 0xFF) + jnp.sum(r.mapped) + jnp.sum(r.score)

    def stage_kmers_a(g, off, pos, reads):
        return stage_kmers(reads)

    fn = {"kmers": stage_kmers_a, "cs": stage_cs, "csq": stage_csq,
          "lookup": stage_lookup, "owners": stage_owners,
          "gather": stage_gather, "wown": stage_wown,
          "wgather": stage_wgather, "full": stage_full}[STAGE]

    full = codes.reshape(2 * N_BATCHES, BATCH, READ_LEN)
    warm = jax.device_put(jnp.asarray(full[:N_BATCHES]))
    timed = jax.device_put(jnp.asarray(full[N_BATCHES:]))
    jax.block_until_ready([warm, timed])

    @jax.jit
    def run_scan(g, off, pos, stk):
        def body(c, reads):
            return c, fn(g, off, pos, reads)
        _, outs = jax.lax.scan(body, 0, stk)
        return outs

    def fetch(x):
        # block_until_ready is a NO-OP through this relay (physics probe:
        # a 137-GFLOP matmul "completed" in 0.05 ms); only a D2H fetch
        # truly waits, so the timed window fetches every output
        return jax.tree_util.tree_map(np.asarray, x)

    t0 = time.time()
    out = fetch(run_scan(genome_d, off_d, pos_d, warm))
    log(f"compile+first sweep: {time.time()-t0:.1f}s")
    t0 = time.time()
    out = fetch(run_scan(genome_d, off_d, pos_d, timed))
    dt = time.time() - t0
    print(json.dumps({
        "stage": STAGE, "H": H, "n_batches": N_BATCHES,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 3),
        "wall_ms": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
