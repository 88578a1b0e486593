"""Attribute the bench.py compile-time blow-up (N=12: 73 s vs N=36: 693 s).

bench.py compiles the SAME scan body at two trip counts; a lax.scan is a
rolled while-loop, so XLA compile time should be ~flat in trip count.  The
round-4 bench log shows ~10x for 3x the scan length through the sandbox's
REMOTE compile helper.  This probe AOT-compiles the identical program
(ShapeDtypeStruct avals, no data, bench.py's exact shapes/statics) on the
LOCAL CPU backend and reports compile seconds at N in {12, 36}:

  - flat locally  -> the blow-up is the relay's remote compiler, not XLA
  - ~10x locally  -> XLA itself scales with trip count at this program size

Prints one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME_SIZE = 4_600_000
N_POSITIONS = 4_599_988      # bench.py round-4 log (k=13, skip 1, canonical)
READ_LEN = 100
BATCH = 4096


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.models.mapper import map_step

    cfg = NgmConfig()
    H = cfg.resolved_read_hits(N_POSITIONS, READ_LEN)
    band = cfg.corridor_for(READ_LEN)
    statics = dict(
        k=cfg.kmer, fanout_cap=cfg.max_kmer_fanout, hit_cap=H,
        max_cmrs=cfg.max_cmrs, diag_bin_log2=cfg.diag_bin_log2, band=band,
        min_kmer_hits=1, read_stride=cfg.read_kmer_skip,
        packed_offsets=True, canonical=True,
        sw_backend=cfg.sw_backend, simple_matrix=True,
    )
    lens_d = jnp.zeros((BATCH,), jnp.int32) + READ_LEN
    mats_d = jnp.zeros((2, 8, 8), jnp.int32)
    scal = (
        jnp.int32(cfg.gap_read_penalty), jnp.int32(cfg.gap_ref_penalty),
        jnp.int32(cfg.gap_extend_penalty), jnp.float32(cfg.sensitivity),
        jnp.int32(cfg.max_kmer_freq),
        jnp.float32(cfg.min_identity), jnp.float32(cfg.min_residues),
    )

    @jax.jit
    def run_scan(genome, off, pos, stk, tp, ts):
        def body(c, xs):
            batch_codes, tpb, tsb = xs
            r = map_step(
                genome, off, pos, batch_codes, lens_d, mats_d, *scal,
                **statics,
            )
            ok = r.mapped & (jnp.abs(r.pos - tpb) <= 5) & (r.strand == tsb)
            return c, (jnp.sum(r.mapped), jnp.sum(ok), jnp.sum(r.n_candidates))
        return jax.lax.scan(body, 0, (stk, tp, ts))[1]

    sds = jax.ShapeDtypeStruct
    res = {}
    for n in (12, 36):
        args = (
            sds((GENOME_SIZE,), jnp.uint8),
            sds((4 ** cfg.kmer + 1,), jnp.uint32),      # packed offsets
            sds((N_POSITIONS,), jnp.int32),
            sds((n, BATCH, READ_LEN), jnp.uint8),
            sds((n, BATCH), jnp.int32),
            sds((n, BATCH), jnp.int32),
        )
        t0 = time.time()
        lowered = run_scan.lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        res[n] = {"lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1)}
        print(f"N={n}: lower {t_lower:.1f}s compile {t_compile:.1f}s",
              file=sys.stderr, flush=True)
    ratio = res[36]["compile_s"] / max(res[12]["compile_s"], 1e-9)
    print(json.dumps({"backend": jax.devices()[0].platform,
                      "n12": res[12], "n36": res[36],
                      "compile_ratio_36_over_12": round(ratio, 2)}))


if __name__ == "__main__":
    main()
