"""Standalone banded-SW score-kernel GCUPS (the BASELINE roofline row).

Measures cell-updates/s of the score kernel alone at config-2-like shapes
([B, 150] x W=56), for both backends and both substitution paths:

  NGM_SW_BACKEND=pallas|xla   NGM_SW_SIMPLE=1|0

The op-mix ceiling comparison: BASELINE round 2 derived ~34 VPU ops/cell
(general path) against a measured 0.30 T int32 ops/s dependent-chain rate
-> ~9 GCUPS ceiling, measured 3.02 (33%).  The round-3 simple-matrix path
removes ~11 ops/cell (5-plane substitution -> one compare+select), so the
same derivation gives ~23 ops/cell -> ~13 GCUPS ceiling; this probe
measures what the kernel actually achieves.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("NGM_PROBE_B", 4096))
L = int(os.environ.get("NGM_PROBE_L", 150))
W = int(os.environ.get("NGM_PROBE_W", 56))
N = int(os.environ.get("NGM_PROBE_N", 20))
BACKEND = os.environ.get("NGM_SW_BACKEND", "pallas")
SIMPLE = os.environ.get("NGM_SW_SIMPLE", "1") == "1"


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.ops.scoring import score_matrix
    from nextgenmap_tpu.ops.sw_pallas import banded_sw_score_pallas
    from nextgenmap_tpu.ops.sw_ref import banded_sw_score

    cfg = NgmConfig()
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, L)).astype(np.uint8)
    r = rng.integers(0, 4, (B, L + W)).astype(np.uint8)
    for i in range(0, B, 2):          # real alignments for half the rows
        o = int(rng.integers(0, W))
        r[i, o:o + L] = q[i]
    lens = jnp.full((B,), L, jnp.int32)
    mats = jnp.asarray(np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)]))
    msel = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
    gq = jnp.int32(20); gr = jnp.int32(20); ge = jnp.int32(20)
    # DISTINCT inputs per timed call: repeated identical dispatches measure
    # impossibly fast through the axon tunnel (result dedup?)
    qds = [jax.device_put(jnp.asarray(np.roll(q, i, axis=0))) for i in range(N)]
    rds = [jax.device_put(jnp.asarray(np.roll(r, i, axis=0))) for i in range(N)]
    jax.block_until_ready([qds, rds])

    fn = banded_sw_score_pallas if BACKEND == "pallas" else banded_sw_score
    kw = dict(band=W, simple=SIMPLE)

    if os.environ.get("NGM_SW_SCAN", "0") == "1":
        # TRUE device-time GCUPS: one dispatch, N in-program executions over
        # distinct slices (lax.scan) — no per-dispatch tunnel latency in the
        # numerator, so this is the number the roofline row should carry
        qs = jnp.stack(qds)
        rs = jnp.stack(rds)
        jax.block_until_ready([qs, rs])

        @jax.jit
        def run_scan(qs, rs):
            def body(c, xs):
                qi, ri = xs
                return c, fn(qi, lens, ri, mats, gq, gr, ge, msel, **kw)
            _, outs = jax.lax.scan(body, 0, (qs, rs))
            return outs

        import numpy as _np

        def fetch(x):  # block_until_ready is a no-op on this relay
            return jax.tree_util.tree_map(_np.asarray, x)

        qs2 = jnp.stack([jnp.asarray(np.roll(q, N + i, axis=0))
                         for i in range(N)])
        rs2 = jnp.stack([jnp.asarray(np.roll(r, N + i, axis=0))
                         for i in range(N)])
        jax.block_until_ready([qs2, rs2])
        fetch(run_scan(qs, rs))
        t0 = time.time()
        out = fetch(run_scan(qs2, rs2))
        dt = time.time() - t0
        cells = B * L * W * N
        print(json.dumps({
            "backend": BACKEND, "simple": SIMPLE, "scan": True,
            "shape": [B, L, W],
            "ms_per_call": round(dt / N * 1e3, 3),
            "gcups": round(cells / dt / 1e9, 3),
        }))
        return

    out = fn(qds[0], lens, rds[0], mats, gq, gr, ge, msel, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(qds[i], lens, rds[i], mats, gq, gr, ge, msel, **kw)
            for i in range(N)]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    cells = B * L * W * N
    print(json.dumps({
        "backend": BACKEND, "simple": SIMPLE,
        "shape": [B, L, W],
        "ms_per_call": round(dt / N * 1e3, 3),
        "gcups": round(cells / dt / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
