"""Device-built CSR index must be lookup-equivalent to the host build."""

import jax.numpy as jnp
import numpy as np

from nextgenmap_tpu.index.device_build import build_index_device
from nextgenmap_tpu.index.kmer_index import KmerIndex


def test_device_build_matches_host(ecoli_like):
    g = ecoli_like[:40_000]
    k, skip = 8, 2
    host = KmerIndex.build(g, k=k, skip=skip, max_freq=1 << 30)  # no masking
    off_d, pos_d = build_index_device(jnp.asarray(g), k=k, skip=skip)
    off_d = np.asarray(off_d)
    pos_d = np.asarray(pos_d)
    # every real bucket's row must match exactly (ascending order included)
    assert np.array_equal(off_d[: 4**k + 1], host.offsets)
    n = int(host.offsets[-1])
    assert np.array_equal(pos_d[:n], host.positions.astype(np.int32))


def test_device_build_invalid_windows_routed_out():
    g = np.array([0, 1, 2, 3, 4, 0, 1, 2, 3, 0, 1] + [0] * 10, dtype=np.uint8)
    k = 3
    off_d, pos_d = build_index_device(jnp.asarray(g), k=k, skip=1)
    off_d = np.asarray(off_d)
    nb = 4**k
    # windows covering the N at index 4 fall in the overflow bucket
    n_invalid = off_d[nb + 1] - off_d[nb]
    assert n_invalid == 3  # windows starting at 2, 3, 4
    # all real-bucket positions valid
    total_real = off_d[nb]
    assert total_real == (g.shape[0] - k + 1) - 3


def test_device_build_collapse_ct(ecoli_like):
    g = ecoli_like[:5_000]
    host = KmerIndex.build(g, k=8, skip=1, max_freq=1 << 30, collapse="ct")
    off_d, pos_d = build_index_device(jnp.asarray(g), k=8, skip=1, collapse="ct")
    assert np.array_equal(np.asarray(off_d)[: 4**8 + 1], host.offsets)
