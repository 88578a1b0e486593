"""Attribute the CS lookup wall: random HBM element-gather behavior on chip.

Truth protocol (BASELINE.md round 3): each variant runs as ONE lax.scan
program over N index-batches, timed INCLUDING the device->host fetch of the
(reduced) outputs; marginal per-batch time from a two-point fit.

Variants (NGM_GPROBE=...):
  rand      : off[idx] with uniform-random [4096, 69] indices into the
              config-2-sized packed table (67M uint32) — the production
              lookup access pattern
  sorted    : same indices pre-sorted ascending per batch (locality probe:
              if the gather is DRAM-row-miss-bound, this flies; if it is
              issue-overhead-bound, identical)
  sortin    : indices sorted IN-PROGRAM (jnp.sort of the flattened [B*Q])
              then gathered and un-permuted — what production could
              actually do; includes the sort + unsort cost
  small     : random indices into a 1M-entry table (4 MB, cache-resident?)
  pos       : the production positions-gather shape: [4096, 192] indices,
              85% clamped to 0 (valid-prefix pattern), 32M-entry table
  posrand   : [4096, 192] fully random into 32M — upper bound for posgather
  big8      : random gather of uint8 from the same index space (byte table)
  pair      : row gather of (1,2) uint32 slices from a [67M, 2] table with
              the SAME [4096, 69] random row indices — if this costs the
              same as `rand`, gather cost is per-ISSUE, not per-byte, and
              an inline-positions index (count+positions packed per row)
              can collapse offsets+positions into one gather stage
  quad      : row gather of (1,4) slices from [67M, 4]
  oct       : row gather of (1,8) slices from [67M, 8]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = os.environ.get("NGM_GPROBE", "rand")
B, Q, H = 4096, 69, 192
N_BATCHES = 8
TABLE_N = 4 ** 13  # 67M — the k=13 packed-offsets table size


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    rng = np.random.default_rng(7)
    tab_n = 1_000_000 if VARIANT == "small" else TABLE_N
    if VARIANT in ("pos", "posrand"):
        tab_n = 32_000_000
    width = {"pair": 2, "quad": 4, "oct": 8}.get(VARIANT, 0)
    table = jax.device_put(
        jnp.asarray(
            rng.integers(
                0, 2**31, tab_n * max(1, width), dtype=np.int64
            ).astype(np.uint32).reshape((tab_n, width) if width else (tab_n,))
        )
    )
    if VARIANT == "big8":
        table = (table & 0xFF).astype(jnp.uint8)

    shape = (N_BATCHES * 2, B, H if VARIANT in ("pos", "posrand") else Q)
    idx = rng.integers(0, tab_n, shape).astype(np.int32)
    if VARIANT == "sorted":
        idx = np.sort(idx.reshape(shape[0], -1), axis=1).reshape(shape)
    if VARIANT == "pos":
        # valid-prefix pattern: ~15% of slots hold a real (random) index,
        # the rest are clamped to 0 — matches pos = positions[where(valid,
        # pidx, 0)] at config-2 occupancy (mean ~35 hits of H=192)
        mask = np.arange(shape[2])[None, None, :] < 35
        idx = np.where(mask, idx, 0)
    idx_d = jax.device_put(jnp.asarray(idx))
    jax.block_until_ready([table, idx_d])

    @jax.jit
    def run_scan(tab, stk):
        def body(c, ix):
            if VARIANT == "sortin":
                flat = ix.reshape(-1)
                order = jnp.argsort(flat)
                g = tab[flat[order]]
                inv = jnp.zeros_like(order).at[order].set(
                    jax.lax.broadcasted_iota(jnp.int32, (flat.shape[0], 1), 0)[:, 0]
                )
                v = g[inv].reshape(ix.shape)
            elif width:
                v = tab[ix]            # [B, Q, width] row gather
            else:
                v = tab[ix]
            return c, jnp.sum(v & 0xFF)
        return jax.lax.scan(body, 0, stk)[1]

    def fetch(x):
        return jax.tree_util.tree_map(np.asarray, x)

    warm, timed = idx_d[:N_BATCHES], idx_d[N_BATCHES:]
    walls = {}
    for n in (N_BATCHES // 2, N_BATCHES):
        t0 = time.time()
        fetch(run_scan(table, warm[:n]))
        log(f"compile+warm (N={n}): {time.time()-t0:.1f}s")
        t0 = time.time()
        fetch(run_scan(table, timed[:n]))
        walls[n] = time.time() - t0
    n1, n2 = N_BATCHES // 2, N_BATCHES
    ms = (walls[n2] - walls[n1]) / (n2 - n1) * 1e3
    n_elem = int(np.prod(shape[1:]))
    print(json.dumps({
        "variant": VARIANT, "table_n": tab_n, "elems_per_batch": n_elem,
        "ms_per_batch": round(ms, 3),
        "ns_per_elem": round(ms * 1e6 / n_elem, 2),
    }))


if __name__ == "__main__":
    main()
