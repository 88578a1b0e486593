"""Capability probe: Mosaic tpu.dynamic_gather (same-shape, dim 0/1) on v5e.

jax 0.9 lowers a SAME-SHAPE 2D elementwise lax.gather inside Pallas kernels
to tpu.dynamic_gather (mosaic/lowering.py:2464): x, idx, out all [R, W];
dim 0: out[i,j] = x[idx[i,j], j]; dim 1: out[i,j] = x[i, idx[i,j]].

The round-4 use case is dim 1 with a WIDE minor: compacting word-expanded
position lanes [B, HW*8] down to hit slots [B, H] (the XLA per-row
take_along_axis lowering is element-serial, ~11 ns/elem — the same wall as
the flat gather).  If dim-1 dynamic_gather runs at ~VPU rate for minor
extents of 512-2048, the compaction is free.

  NGM_DG_DIM=1 NGM_DG_W=1024 NGM_DG_R=256 python tools/probe_dyngather.py
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = int(os.environ.get("NGM_DG_DIM", 1))
W = int(os.environ.get("NGM_DG_W", 1024))    # minor extent
R = int(os.environ.get("NGM_DG_R", 256))     # rows per call
REP = int(os.environ.get("NGM_DG_REP", 32))  # gathers inside the kernel
INTERP = os.environ.get("NGM_DG_INTERP", "0") == "1"


def main() -> None:
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 20, size=(R, W), dtype=np.int32)
    extent = R if DIM == 0 else W
    idx = rng.integers(0, extent, size=(R, W), dtype=np.int32)

    def kern(x_ref, idx_ref, out_ref):
        t = x_ref[:, :]
        acc = jnp.zeros((R, W), jnp.int32)
        for i in range(REP):
            ix = idx_ref[:, :]
            if i:
                ix = (ix + i * 7) % extent
            g = jnp.take_along_axis(t, ix, axis=DIM, mode="promise_in_bounds")
            acc = acc + g
        out_ref[:, :] = acc

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )
    t0 = time.time()
    try:
        out = np.asarray(jax.jit(f)(jnp.asarray(x), jnp.asarray(idx)))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"dim": DIM, "w": W, "ok": False,
                          "err": str(e).splitlines()[0][:300]}))
        return
    compile_s = time.time() - t0

    exp = np.zeros((R, W), np.int64)
    for i in range(REP):
        ix = (idx.astype(np.int64) + i * 7) % extent if i else idx
        exp += np.take_along_axis(x, ix, axis=DIM)
    correct = bool(np.array_equal(out.astype(np.int64), exp))

    K = 16
    idxs = rng.integers(0, extent, size=(2 * K, R, W), dtype=np.int32)

    @jax.jit
    def scan(x, stk):
        def body(c, ix):
            o = f(x, ix)
            return c, jnp.sum(o & 0xFF)
        _, outs = jax.lax.scan(body, 0, stk)
        return outs

    x_d = jnp.asarray(x)
    stk = jnp.asarray(idxs)
    np.asarray(scan(x_d, stk[:K]))
    t0 = time.time()
    np.asarray(scan(x_d, stk[K:]))
    dt = time.time() - t0
    n = K * REP * R * W
    print(json.dumps({
        "dim": DIM, "w": W, "r": R, "ok": True, "correct": correct,
        "compile_s": round(compile_s, 1),
        "ns_per_elem": round(dt / n * 1e9, 4),
        "gelem_per_s": round(n / dt / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
