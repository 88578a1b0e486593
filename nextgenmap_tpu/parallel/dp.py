"""Data parallelism over reads — shard_map over the "dp" mesh axis.

Reference analog: the `-t` pthread CS workers pulling read batches from a
shared provider (ref:src/NGM.cpp) — here each device is a "worker" holding a
contiguous slice of the batch; genome/index/matrices are replicated.  There
is no cross-read communication in the mapping step, so the only collectives
are psums of the overflow audit counters.  Contiguous block sharding keeps
mate pairs (rows 2i/2i+1) on one device as long as the per-device batch is
even (pipeline/runner pads batches accordingly).

This is the layer that carries the reads/s scaling metric (SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nextgenmap_tpu.models.mapper import MapResult, map_step, map_step_paired


def _result_specs() -> MapResult:
    """PartitionSpecs for MapResult: per-read arrays on dp, counters replicated."""
    return MapResult(
        mapped=P("dp"), strand=P("dp"), pos=P("dp"), mapq=P("dp"),
        score=P("dp"), second=P("dp"), q_start=P("dp"), q_end=P("dp"),
        ops=P("dp"), n_ops=P("dp"), matches=P("dp"), mismatches=P("dp"),
        indels=P("dp"), n_candidates=P("dp"), proper=P("dp"),
        fanout_overflow=P(), cmr_overflow=P(),
    )


def make_dp_map_step(mesh: Mesh, paired: bool, **statics):
    """shard_map-wrapped mapping step over the "dp" axis of `mesh`.

    Returned callable has the same signature as map_step / map_step_paired;
    reads & lengths must have batch divisible by the dp axis size (and by
    2 * dp size for paired batches).
    """
    base = map_step_paired if paired else map_step
    fn = partial(base, **statics)

    def inner(*args):
        res = fn(*args)
        return res._replace(
            fanout_overflow=jax.lax.psum(res.fanout_overflow, "dp"),
            cmr_overflow=jax.lax.psum(res.cmr_overflow, "dp"),
        )

    n_scalar = 10 if paired else 7  # trailing scalar args after matrices
    in_specs = (
        P(), P(), P(),            # genome, offsets, positions: replicated
        P("dp"), P("dp"),         # reads, lengths: sharded over batch
        P(),                      # matrices
    ) + (P(),) * n_scalar         # gap penalties + scalars: replicated

    return jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=_result_specs(),
            # scan carries in the SW kernels mix replicated inits with varying
            # data; skip the varying-manual-axes check rather than pcast every
            # carry (results are validated shard-vs-single in tests)
            check_vma=False,
        )
    )
