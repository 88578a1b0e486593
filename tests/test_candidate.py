"""Candidate-search tests: hand-built reads with known diagonals, threshold
behavior, caps/fallbacks, strand handling (SURVEY.md §4 item 4)."""

import jax.numpy as jnp
import numpy as np

from nextgenmap_tpu.index.kmer_index import KmerIndex
from nextgenmap_tpu.io.encode import revcomp_codes
from nextgenmap_tpu.ops.candidate import (
    SENTINEL, candidate_search, merge_strand_candidates,
)
from nextgenmap_tpu.ops.kmer import extract_kmers

K = 8


def make_index(genome):
    idx = KmerIndex.build(genome, k=K, skip=1, max_freq=10_000)
    off, pos = idx.device_arrays()
    return jnp.asarray(off), jnp.asarray(pos)


def search(reads, lengths, off, pos, sens=0.5, fanout=16, cmrs=8, binlog=4,
           max_freq=10_000):
    km, ok = extract_kmers(jnp.asarray(reads), jnp.asarray(lengths, jnp.int32), K)
    return candidate_search(
        km, ok, off, pos, jnp.float32(sens), jnp.int32(max_freq),
        fanout_cap=fanout, max_cmrs=cmrs, diag_bin_log2=binlog,
    )


def test_exact_read_finds_diagonal(ecoli_like):
    g = ecoli_like[:50_000]
    off, pos = make_index(g)
    L = 64
    origin = 1234
    read = g[origin : origin + L]
    res = search(read[None].astype(np.uint8), [L], off, pos)
    # best candidate bucket should contain the true diagonal `origin`
    b = int(res.bucket[0, 0])
    assert b != int(SENTINEL)
    assert b <= origin >> 4 <= b + 1  # pair-merge means bucket or bucket+1
    # exact read: every kmer hits => score ~ number of kmers
    assert int(res.score[0, 0]) >= (L - K) // 2


def test_reverse_strand_candidates(ecoli_like):
    g = ecoli_like[:50_000]
    off, pos = make_index(g)
    L = 64
    origin = 9000
    read = revcomp_codes(g[origin : origin + L])  # sequenced from reverse strand
    # forward search of the read itself should find little; rc(read) should hit
    fwd = search(read[None], [L], off, pos)
    rc = search(revcomp_codes(read)[None], [L], off, pos)
    assert int(rc.score[0, 0]) > int(fwd.score[0, 0])
    merged_bucket, merged_score, merged_strand = merge_strand_candidates(fwd, rc, 8)
    assert int(merged_strand[0, 0]) == 1  # best is on reverse strand
    b = int(merged_bucket[0, 0])
    assert b <= origin >> 4 <= b + 1


def test_sensitivity_threshold(ecoli_like):
    g = ecoli_like[:50_000]
    off, pos = make_index(g)
    L = 64
    # read = half locus A, half locus B: two candidate regions, each ~50% score
    a, b = 3000, 20000
    read = np.concatenate([g[a : a + L // 2], g[b : b + L // 2]]).astype(np.uint8)
    hi = search(read[None], [L], off, pos, sens=0.9)   # strict: only best region
    lo = search(read[None], [L], off, pos, sens=0.2)   # permissive: both
    n_hi = int(jnp.sum(hi.score[0] > 0))
    n_lo = int(jnp.sum(lo.score[0] > 0))
    assert n_lo >= 2
    assert n_hi <= n_lo


def test_mutated_read_still_found(ecoli_like):
    g = ecoli_like[:50_000]
    off, pos = make_index(g)
    L = 100
    origin = 40_000
    rng = np.random.default_rng(0)
    read = g[origin : origin + L].copy()
    # 10% SNPs — the sensitivity-over-identity regime
    for p in rng.choice(L, size=10, replace=False):
        read[p] = (read[p] + 1 + rng.integers(0, 3)) % 4
    res = search(read[None], [L], off, pos, sens=0.3)
    found = False
    for c in range(res.bucket.shape[1]):
        bkt = int(res.bucket[0, c])
        if bkt != int(SENTINEL) and bkt <= origin >> 4 <= bkt + 1:
            found = True
    assert found


def test_fanout_overflow_counted():
    # genome = one 8-mer repeated: every lookup overflows any small cap
    unit = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    g = np.tile(unit, 200)
    off, pos = make_index(g)
    read = np.tile(unit, 4).astype(np.uint8)
    res = search(read[None], [32], off, pos, fanout=4)
    assert int(res.fanout_overflow) > 0


def test_no_candidates_for_alien_read(ecoli_like):
    g = ecoli_like[:20_000]
    off, pos = make_index(g)
    rng = np.random.default_rng(1)
    # random read is unlikely to produce a coherent diagonal: best score small
    read = rng.integers(0, 4, 64).astype(np.uint8)
    res = search(read[None], [64], off, pos)
    assert int(res.best_score[0]) <= 3


def test_batch_invariance(ecoli_like):
    g = ecoli_like[:30_000]
    off, pos = make_index(g)
    L = 64
    reads = np.stack([g[i * 1000 : i * 1000 + L] for i in range(8)]).astype(np.uint8)
    lens = np.full(8, L, np.int32)
    full = search(reads, lens, off, pos)
    for i in range(8):
        one = search(reads[i][None], [L], off, pos)
        assert full.bucket[i].tolist() == one.bucket[0].tolist()
        assert full.score[i].tolist() == one.score[0].tolist()


def test_padding_rows_inert(ecoli_like):
    g = ecoli_like[:30_000]
    off, pos = make_index(g)
    L = 64
    reads = np.full((4, L), 4, np.uint8)  # all-PAD rows
    res = search(reads, np.zeros(4, np.int32), off, pos)
    assert int(jnp.sum(res.score)) == 0
    assert (np.asarray(res.bucket) == int(SENTINEL)).all()


def test_packed_offsets_identical():
    """pack_offsets single-gather path == two-gather path, bit for bit."""
    import numpy as np

    from nextgenmap_tpu.index.kmer_index import KmerIndex
    from nextgenmap_tpu.io.simulate import random_genome
    from nextgenmap_tpu.ops.candidate import candidate_search_dual, pack_offsets
    from nextgenmap_tpu.ops.kmer import extract_kmers

    g = random_genome(20_000, seed=51)
    idx = KmerIndex.build(g, k=11, skip=1, max_freq=100)
    off, pos = idx.device_arrays()
    rng = np.random.default_rng(52)
    starts = rng.integers(0, 20_000 - 80, size=64)
    reads = np.stack([g[s : s + 80] for s in starts])
    lens = np.full(64, 80, np.int32)
    km_f, ok_f = extract_kmers(reads, lens, 11, stride=2)
    km_r, ok_r = extract_kmers(reads[:, ::-1], lens, 11, stride=2)

    import jax.numpy as jnp

    packed = pack_offsets(jnp.asarray(off), 100, 32)
    assert packed is not None
    kw = dict(fanout_cap=32, hit_cap=128, max_cmrs=16, diag_bin_log2=4, stride=2)
    a = candidate_search_dual(km_f, ok_f, km_r, ok_r, jnp.asarray(off),
                              jnp.asarray(pos), jnp.float32(0.5),
                              jnp.int32(100), **kw)
    b = candidate_search_dual(km_f, ok_f, km_r, ok_r, packed,
                              jnp.asarray(pos), jnp.float32(0.5),
                              jnp.int32(100), packed_offsets=True, **kw)
    for f in ("bucket", "score", "strand", "best_score"):
        assert (np.asarray(getattr(a, f)) == np.asarray(getattr(b, f))).all(), f
    assert int(a.fanout_overflow) == int(b.fanout_overflow)
    assert int(a.hit_overflow) == int(b.hit_overflow)


def test_slot_owners_variants_agree():
    """Rank-merge and scatter-fill ownership == dense compare-sum, exactly."""
    import numpy as np

    from functools import partial

    from nextgenmap_tpu.ops.candidate import (
        _slot_owners_bisect, _slot_owners_dense, _slot_owners_dense1,
        _slot_owners_dense2, _slot_owners_scatter, _slot_owners_sorted,
    )

    _dense1t = partial(_slot_owners_dense1, transposed=True)

    rng = np.random.default_rng(71)
    for trial in range(4):
        B, Qt, H = 7, 33, [8, 64, 300, 1000][trial]
        cnt = rng.integers(0, 6, size=(B, Qt)).astype(np.int32)
        # rows with zero hits and rows that overflow H both occur
        cnt[0] = 0
        o0 = rng.integers(0, 2**30, size=(B, Qt)).astype(np.int32)
        flip = rng.integers(0, 2, size=(B, Qt)).astype(np.int32)
        cum = np.cumsum(cnt, axis=1) - cnt
        qd, pd, fd = _slot_owners_dense(cum, o0, flip, H)
        total = cum[:, -1] + cnt[:, -1]
        valid = np.arange(H)[None, :] < np.minimum(total, H)[:, None]
        for other in (_slot_owners_sorted, _slot_owners_scatter,
                      _slot_owners_bisect, _slot_owners_dense2,
                      _slot_owners_dense1, _dense1t):
            if other is _slot_owners_scatter:
                qs, ps, fs = other(cum, o0, flip, H, cnt)
            else:
                qs, ps, fs = other(cum, o0, flip, H)
            assert (np.asarray(qd)[valid] == np.asarray(qs)[valid]).all(), trial
            assert (np.asarray(pd)[valid] == np.asarray(ps)[valid]).all(), trial
            assert (np.asarray(fd)[valid] == np.asarray(fs)[valid]).all(), trial

        # no-payload shape (dual-strand path)
        qd, pd, _ = _slot_owners_dense(cum, o0, None, H)
        qs, ps, ns = _slot_owners_scatter(cum, o0, None, H, cnt)
        assert ns is None
        assert (np.asarray(qd)[valid] == np.asarray(qs)[valid]).all(), trial
        assert (np.asarray(pd)[valid] == np.asarray(ps)[valid]).all(), trial


def test_compact_hits_sorted_path_end_to_end():
    """candidate_search with H past the dense threshold stays correct."""
    import numpy as np

    from nextgenmap_tpu.index.kmer_index import KmerIndex
    from nextgenmap_tpu.io.simulate import random_genome
    from nextgenmap_tpu.ops.candidate import candidate_search
    from nextgenmap_tpu.ops.kmer import extract_kmers

    import jax.numpy as jnp

    g = random_genome(8_000, seed=72)
    idx = KmerIndex.build(g, k=8, skip=1, max_freq=1000)  # dense rows at k=8
    off, pos = idx.device_arrays()
    rng = np.random.default_rng(73)
    starts = rng.integers(0, 8_000 - 60, size=16)
    reads = np.stack([g[s : s + 60] for s in starts])
    lens = np.full(16, 60, np.int32)
    km, ok = extract_kmers(reads, lens, 8, stride=1)
    kw = dict(fanout_cap=32, max_cmrs=8, diag_bin_log2=4, stride=1)
    small = candidate_search(km, ok, jnp.asarray(off), jnp.asarray(pos),
                             jnp.float32(0.9), jnp.int32(1000),
                             hit_cap=256, **kw)
    big = candidate_search(km, ok, jnp.asarray(off), jnp.asarray(pos),
                           jnp.float32(0.9), jnp.int32(1000),
                           hit_cap=512, **kw)
    # with no overflow at either cap, the candidate lists must agree
    assert int(small.hit_overflow) == int(big.hit_overflow) == 0
    for f in ("bucket", "score", "strand"):
        assert (np.asarray(getattr(small, f)) == np.asarray(getattr(big, f))).all()
    # every read's true locus must surface as the best candidate
    best_bucket = np.asarray(big.bucket)[:, 0]
    assert (np.abs((best_bucket << 4) - starts) <= 32).all()
