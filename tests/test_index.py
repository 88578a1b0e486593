import numpy as np
import pytest

from nextgenmap_tpu.index.kmer_index import KmerIndex, kmer_values
from nextgenmap_tpu.io.encode import encode_seq


def brute_force_index(codes, k, skip, max_freq):
    """Oracle: dict kmer -> sorted positions, stride + N-skip + freq-cap."""
    from collections import defaultdict

    d = defaultdict(list)
    for p in range(0, codes.shape[0] - k + 1, skip):
        w = codes[p : p + k]
        if w.max() >= 4:
            continue
        v = 0
        for c in w:
            v = (v << 2) | int(c)
        d[v].append(p)
    return {v: ps for v, ps in d.items() if len(ps) <= max_freq}


def test_kmer_values_basic():
    codes = encode_seq("ACGTA")
    v, ok = kmer_values(codes, 3)
    # ACG=0b000110=6, CGT=0b011011=27, GTA=0b101100=44
    assert v.tolist() == [6, 27, 44]
    assert ok.all()


def test_kmer_values_n_invalid():
    codes = encode_seq("ACNTA")
    v, ok = kmer_values(codes, 3)
    assert ok.tolist() == [False, False, False]


def test_build_vs_bruteforce(ecoli_like):
    codes = ecoli_like[:20_000]
    k, skip, cap = 8, 2, 50
    idx = KmerIndex.build(codes, k=k, skip=skip, max_freq=cap)
    oracle = brute_force_index(codes, k, skip, cap)
    total = sum(len(v) for v in oracle.values())
    assert idx.positions.shape[0] == total
    for v, ps in list(oracle.items())[:500]:
        got = idx.lookup(v)
        assert got.tolist() == ps, f"kmer {v}"
    # masked kmers return empty
    for v in range(4**k):
        if v not in oracle:
            assert idx.lookup(v).shape[0] == 0 or v in oracle


def test_csr_rows_sorted(ecoli_like):
    idx = KmerIndex.build(ecoli_like[:30_000], k=8, skip=1, max_freq=100)
    # determinism spec rule 2: rows ascend
    for v in np.random.default_rng(0).integers(0, 4**8, 200):
        row = idx.lookup(int(v))
        assert (np.diff(row.astype(np.int64)) > 0).all() if row.size > 1 else True


def test_freq_cap(ecoli_like):
    codes = np.tile(encode_seq("ACGTACGT"), 100)  # highly repetitive
    idx = KmerIndex.build(codes, k=8, skip=1, max_freq=3)
    assert idx.positions.shape[0] == 0  # every kmer over-frequent


def test_save_load_roundtrip(tmp_path, ecoli_like):
    idx = KmerIndex.build(ecoli_like[:10_000], k=8, skip=2, max_freq=100, genome_sha1="abc")
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = KmerIndex.load(p)
    assert idx2.k == idx.k and idx2.skip == idx.skip
    assert np.array_equal(idx.offsets, idx2.offsets)
    assert np.array_equal(idx.positions, idx2.positions)
    assert idx2.genome_sha1 == "abc"


def test_collapse_ct():
    codes = encode_seq("ACGTTCGT")
    v1, _ = kmer_values(codes, 4, collapse="ct")
    v2, _ = kmer_values(encode_seq("ATGTTTGT"), 4, collapse="ct")
    assert v1.tolist() == v2.tolist()


def test_chunk_boundary_consistency():
    # force multi-chunk path by monkeypatching chunk size
    import nextgenmap_tpu.index.kmer_index as ki

    codes = np.random.default_rng(3).integers(0, 4, 5000).astype(np.uint8)
    old = ki._CHUNK
    try:
        ki._CHUNK = 512
        a = KmerIndex.build(codes, k=8, skip=3, max_freq=99)
    finally:
        ki._CHUNK = old
    b = KmerIndex.build(codes, k=8, skip=3, max_freq=99)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.positions, b.positions)


def test_canonical_index_and_lookup():
    """Canonical rows hold both strands' windows; flip bits decode strand."""
    import numpy as np

    from nextgenmap_tpu.index.kmer_index import (
        KmerIndex, kmer_values, kmer_values_canonical,
    )
    from nextgenmap_tpu.io.simulate import random_genome

    g = random_genome(5_000, seed=61)
    k = 9
    idx = KmerIndex.build(g, k=k, skip=1, max_freq=1000, canonical=True)
    v, ok = kmer_values(g, k)
    cv, cf, cok = kmer_values_canonical(g, k)
    assert (ok == cok).all()
    # canonical value must equal min(v, revcomp(v)) computed independently
    def rc_val(x):
        r = 0
        for j in range(k):
            r = (r << 2) | (3 - (x & 3))
            x >>= 2
        return r
    for i in range(0, 4000, 137):
        if not ok[i]:
            continue
        rv = rc_val(int(v[i]))
        assert int(cv[i]) == min(int(v[i]), rv)
        assert int(cf[i]) == (1 if rv < int(v[i]) else 0)
        # the canonical row contains this window's encoded entry
        entries = idx.lookup(int(cv[i]))
        want = (i << 1) | int(cf[i])
        assert want in entries.tolist()
    # every stored entry decodes to a real window of the right canon value
    total = int(idx.offsets[-1])
    assert total == int(cok.sum())


def test_canonical_device_matches_host():
    import jax.numpy as jnp
    import numpy as np

    from nextgenmap_tpu.index.device_build import build_index_device
    from nextgenmap_tpu.index.kmer_index import KmerIndex
    from nextgenmap_tpu.io.simulate import random_genome

    g = random_genome(4_000, seed=62)
    k = 8
    host = KmerIndex.build(g, k=k, skip=1, max_freq=10**9, canonical=True)
    off_d, pos_d = build_index_device(jnp.asarray(g), k=k, skip=1,
                                      canonical=True)
    off_d = np.asarray(off_d)
    pos_d = np.asarray(pos_d)
    nb = 4**k
    assert (off_d[: nb + 1] == host.offsets).all()
    assert (pos_d[: int(host.offsets[-1])] == host.positions.astype(np.int64)).all()


def test_native_build_matches_numpy():
    """Native C two-pass CSR build == numpy build, byte for byte, across
    collapse modes and canonical (VERDICT r1 item 10)."""
    import numpy as np

    from nextgenmap_tpu import native
    from nextgenmap_tpu.io.simulate import random_genome

    assert native.lib() is not None
    g = random_genome(80_000, seed=55).copy()
    g[1000:1010] = 4  # N run: k-mer validity windows
    for collapse, canonical in (("none", False), ("none", True),
                                ("ct", False), ("ga", False)):
        for skip in (1, 2, 3):
            a = KmerIndex.build(g, k=9, skip=skip, max_freq=50,
                                collapse=collapse, canonical=canonical)
            old = native._LIB, native._TRIED
            native._LIB, native._TRIED = None, True
            try:
                b = KmerIndex.build(g, k=9, skip=skip, max_freq=50,
                                    collapse=collapse, canonical=canonical)
            finally:
                native._LIB, native._TRIED = old
            assert np.array_equal(a.offsets, b.offsets), (collapse, canonical, skip)
            assert np.array_equal(a.positions, b.positions), (collapse, canonical, skip)
