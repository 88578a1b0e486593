"""Device-side k-mer extraction over read batches.

Reference analog: ``CS::PrefixIteration`` (ref:src/CS.cpp) — the per-read
k-mer enumerator feeding index lookups.  Here it is a jitted rolling-hash
over the whole ``[B, L]`` batch at once; k is static so the window combine
unrolls to k vector ops on the VPU.

Read-side k-mers are enumerated at stride ``read_kmer_skip`` (default 1 —
REQUIRED when the index strides global genome positions, otherwise stride
phases can miss a locus entirely; see DESIGN.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nextgenmap_tpu.io.encode import CODE_C, CODE_T


@partial(jax.jit, static_argnames=("k", "stride", "collapse_ct"))
def extract_kmers(codes: jax.Array, lengths: jax.Array, k: int, stride: int = 1,
                  collapse_ct: bool = False):
    """Rolling k-mer values for a read batch.

    Args:
      codes: [B, L] uint8/int32 base codes (0..3 bases, 4 = N/pad).
      lengths: [B] int32 true read lengths.
      k: k-mer length (static, <= 15 so values fit int32 for k<=13; int32 is
         fine up to 4^15 < 2^31).
      stride: read-side enumeration stride (static).
      collapse_ct: hash C as T (bisulfite mode).

    Returns:
      (kmers [B, Q] int32, valid [B, Q] bool) with Q = (L-k)//stride + 1.
      Invalid where the window contains non-ACGT or runs past the read end.
    """
    B, L = codes.shape
    Q = max(1, (L - k) // stride + 1)
    c = codes.astype(jnp.int32)
    if collapse_ct:
        c = jnp.where(c == CODE_C, CODE_T, c)
    vals = jnp.zeros((B, Q), dtype=jnp.int32)
    ok = jnp.ones((B, Q), dtype=bool)
    for j in range(k):
        w = jax.lax.slice(c, (0, j), (B, j + (Q - 1) * stride + 1), (1, stride))
        vals = (vals << 2) | (w & 3)
        ok &= w < 4
    # windows running past the read's true length are invalid
    qpos = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1) * stride
    ok &= qpos + k <= lengths[:, None]
    return vals, ok
