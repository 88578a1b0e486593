"""In-program gather cost probe (the CS position fetch).

The round-3 CS breakdown attributes most of the compaction cost to the ONE
[B, H] = 1M-element random gather from the positions table (compact@H=8
8.1 ms vs @H=256 26.0 ms while the ownership-pass count barely moves the
needle: dense2 44.4 vs dense 46.8 ms full-step).  This probe times the
gather patterns standalone-but-realistically (jitted fn with VARIED inputs
per call — identical repeated inputs measure as impossibly fast through the
axon tunnel, see probe_swonly):

  random   — positions[idx] with uniform random idx           (the CS form)
  sorted   — same elements, idx pre-sorted ascending          (bandwidth?)
  sortgath — sort(idx) + gather + scatter-back-to-rank        (net win?)

Prints one JSON line per pattern.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE = int(os.environ.get("NGM_PROBE_TABLE", 64_000_000))
NIDX = int(os.environ.get("NGM_PROBE_IDX", 1 << 20))
N = int(os.environ.get("NGM_PROBE_N", 10))


def bench(fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    return (time.time() - t0) / len(args_list) * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.asarray(
        rng.integers(0, 2**31 - 1, TABLE, dtype=np.int32)))
    idxs = [
        jax.device_put(jnp.asarray(
            rng.integers(0, TABLE, NIDX, dtype=np.int32)))
        for _ in range(N)
    ]
    idxs_sorted = [jax.device_put(jnp.sort(i)) for i in idxs]
    jax.block_until_ready([tbl, idxs, idxs_sorted])

    f_rand = jax.jit(lambda t, i: t[i])
    f_sg = jax.jit(lambda t, i: jnp.take(
        t[jnp.sort(i)],
        jnp.argsort(jnp.argsort(i)),
    ))

    out = []
    out.append({"pattern": "random",
                "ms": round(bench(f_rand, [(tbl, i) for i in idxs]), 3)})
    out.append({"pattern": "sorted",
                "ms": round(bench(f_rand, [(tbl, i) for i in idxs_sorted]), 3)})
    out.append({"pattern": "sortgath",
                "ms": round(bench(f_sg, [(tbl, i) for i in idxs]), 3)})
    for o in out:
        o["n_idx"] = NIDX
        o["table"] = TABLE
        print(json.dumps(o))


if __name__ == "__main__":
    main()
