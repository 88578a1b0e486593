"""Flat element-gather law on v5e: cost vs table size, sortedness, shape.

The round-4 stage probes put the config-2 CS wall on the ONE [B, H] position
gather (~12-17 ms for 786k elements from a 64M-entry table).  Before writing
any kernel, establish the law:

  - does XLA's flat gather rate depend on TABLE size (cache/transaction
    bound) or is it element-serial (lowering bound)?
  - do sorted indices help (transaction locality)?
  - does index-array shape ([B,H] vs flat) matter?

Protocol: truth protocol — one lax.scan over N distinct index batches inside
one program, fetch-inclusive, ONE folded scalar out.

  NGM_GVAR=rand|sorted|flat  NGM_GT_ELEMS=<table elems>  python tools/probe_gather3.py
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

VAR = os.environ.get("NGM_GVAR", "rand")
T_ELEMS = int(os.environ.get("NGM_GT_ELEMS", 64_000_000))
N_IDX = int(os.environ.get("NGM_GN", 786_432))          # 4096 x 192
N_BATCHES = int(os.environ.get("NGM_PROBE_N", 8))


ROW_W = int(os.environ.get("NGM_GW", 0))  # >0: [T/W, W] row gather instead


def main() -> None:
    rng = np.random.default_rng(7)
    if ROW_W:
        # row gather: out[i, :] = table2d[idx[i], :] — if XLA's serial gather
        # loop costs per DESCRIPTOR (row) rather than per element, wide rows
        # amortize the ~11 ns/descriptor wall
        table = jnp.asarray(rng.integers(
            0, 2**31 - 1, size=(T_ELEMS // ROW_W, ROW_W), dtype=np.int32))
        idx = rng.integers(0, T_ELEMS // ROW_W,
                           size=(2 * N_BATCHES, N_IDX), dtype=np.int32)
        stk = jnp.asarray(idx)
    else:
        table = jnp.asarray(rng.integers(
            0, 2**31 - 1, size=T_ELEMS, dtype=np.int32))
        idx = rng.integers(0, T_ELEMS,
                           size=(2 * N_BATCHES, N_IDX), dtype=np.int32)
        if VAR == "sorted":
            idx = np.sort(idx, axis=1)
        if VAR == "flat":
            stk = jnp.asarray(idx)                      # [2N, n]
        else:
            stk = jnp.asarray(idx.reshape(2 * N_BATCHES, 4096, N_IDX // 4096))
    jax.block_until_ready([table, stk])

    @jax.jit
    def run(tab, stk):
        def body(c, ix):
            v = tab[ix]          # row gather when tab is 2-D
            return c, jnp.sum(v & 0xFF)
        _, outs = jax.lax.scan(body, 0, stk)
        return outs

    warm, timed = stk[:N_BATCHES], stk[N_BATCHES:]
    t0 = time.time()
    np.asarray(run(table, warm))
    print(f"compile+warm: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    np.asarray(run(table, timed))
    dt = time.time() - t0
    print(json.dumps({
        "var": VAR, "table_elems": T_ELEMS, "n_idx": N_IDX, "row_w": ROW_W,
        "ms_per_batch": round(dt / N_BATCHES * 1e3, 3),
        "ns_per_row": round(dt / N_BATCHES / N_IDX * 1e9, 2),
    }))


if __name__ == "__main__":
    main()
