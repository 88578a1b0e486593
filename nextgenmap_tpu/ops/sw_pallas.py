"""Pallas banded Smith-Waterman score kernel (TPU).

Reference analog: the OpenCL score kernel SWOcl (ref:src/SWOcl.cpp,
SURVEY.md §2 component 18) — one work-item per alignment; here one VPU lane
per alignment and the whole band in sublanes.

Semantics are bit-identical to ops/sw_ref.py::banded_sw_score (the "CPU/SSE
backend" analog, components 20): int32 DP, band parametrization ref j = i+o,
lazy-F max-scan (requires gap open >= extend, enforced by NgmConfig), score
ties resolved toward the smallest (i, then o).

Layout: alignments live in LANES (R = 256 per grid block), the band offset o
in SUBLANES (W rows) — so every DP-row op runs on a dense [W, R] tile with
zero lane padding (W is a multiple of 8).  Measured on v5e this matches the
fused XLA scan implementation (~3.2 GCUPS at [4096, 100]xW48 standalone) —
both are VPU-throughput-bound on the same op mix — so it ships as a
selectable backend (NgmConfig.sw_backend) and the tuning platform for
larger bands/longer reads, not the default.  The query/corridor stream in as
TRANSPOSED blocked inputs ([L_pad, R] / [T_pad, R]); the DP loop walks 8
query rows per outer iteration so every dynamic VMEM slice is a provable
multiple of the 8-sublane tile.  Substitution scores come from 5 per-code
coefficient planes precomputed once per block (no gathers anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextgenmap_tpu.ops.sw_ref import ScoreResult

_NEG = -(2**30)

_R = 256  # alignments per grid block (2 lane tiles)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _kernel(mats_ref, gaps_ref, qT_ref, corrT_ref, qlen_ref, msel_ref,
            score_ref, ei_ref, eo_ref, qc_ref, *, L, L_pad, W, n_mats,
            simple=False):
    R = _R
    gq = gaps_ref[0]
    gr = gaps_ref[1]
    ge = gaps_ref[2]

    msel = msel_ref[0, 0, :].astype(jnp.int32)   # [R]

    if not simple:
        q = qT_ref[:, :].astype(jnp.int32)       # [L_pad, R]
        # substitution coefficient planes: qc[c][i, r] = S[msel_r, q[i,r], c]
        for c in range(5):
            plane = jnp.zeros((L_pad, R), jnp.int32)
            for m in range(n_mats):
                for a in range(5):
                    coef = mats_ref[m * 64 + a * 8 + c]
                    sel = q == a if n_mats == 1 else (
                        (q == a) & (msel[None, :] == m)
                    )
                    plane = plane + jnp.where(sel, coef, 0)
            qc_ref[c, :, :] = plane
    mb = mats_ref[0]                             # S[0,0] (simple fast path)
    mis = mats_ref[1]                            # S[0,1]

    off = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    offext = off * ge
    qlen = qlen_ref[0, 0, :]                     # [R]
    neg_row = jnp.full((1, R), _NEG, jnp.int32)

    def outer(j, carry):
        h, e, best, bi, bo = carry
        base = pl.multiple_of(j * 8, 8)
        w_win = corrT_ref[pl.ds(base, W + 8), :].astype(jnp.int32)  # [W+8, R]
        if simple:
            # match/mismatch matrix (scoring.matrices_are_simple): one
            # equality compare replaces the 5-plane combine
            q_blk = qT_ref[pl.ds(base, 8), :].astype(jnp.int32)     # [8, R]
        else:
            qc_blk = [qc_ref[c, pl.ds(base, 8), :] for c in range(5)]

        for t in range(8):
            rw = jax.lax.slice(w_win, (t, 0), (t + W, R))           # [W, R]
            if simple:
                qrow = jax.lax.slice(q_blk, (t, 0), (t + 1, R))     # [1, R]
                hit = (rw == jnp.broadcast_to(qrow, (W, R))) & (qrow < 4)
                sub = jnp.where(hit, mb, mis)
            else:
                sub = jnp.zeros((W, R), jnp.int32)
                for c in range(5):
                    qrow = jax.lax.slice(qc_blk[c], (t, 0), (t + 1, R))
                    sub = sub + jnp.where(
                        rw == c, jnp.broadcast_to(qrow, (W, R)), 0
                    )

            hd = h + sub
            h_up = jnp.concatenate([h[1:], neg_row], axis=0)
            e_up = jnp.concatenate([e[1:], neg_row], axis=0)
            e = jnp.maximum(h_up - gq, e_up - ge)
            htmp = jnp.maximum(jnp.maximum(0, hd), e)
            # lazy-F: exclusive max-scan of htmp + o*ge along the band.
            # The doubling chain must reach the FULL band span: steps
            # 1,2,...,2^ceil(log2(W)) cover gap runs up to W-1 offsets.
            # (A truncated chain silently underestimates F for long gap
            # runs — caught by the W=120/184 oracle tests.)
            a = htmp + offext
            d = 1
            while d < W:
                shifted = jnp.concatenate(
                    [jnp.full((d, R), _NEG, jnp.int32), a[:-d]], axis=0
                )
                a = jnp.maximum(a, shifted)
                d *= 2
            cm_excl = jnp.concatenate([neg_row, a[:-1]], axis=0)
            f = cm_excl - gr - (off - 1) * ge
            h = jnp.maximum(htmp, f)

            i_now = j * 8 + t
            valid = (i_now < qlen)[None, :]                         # [1, R]
            h_m = jnp.where(valid, h, 0)
            rowmax = jnp.max(h_m, axis=0, keepdims=True)            # [1, R]
            # smallest band offset among the row maxima (int argmax is not
            # lowered by Mosaic; min-of-masked-iota is equivalent)
            rowarg = jnp.min(
                jnp.where(h_m == rowmax, off, W), axis=0, keepdims=True
            )
            upd = rowmax > best
            best = jnp.where(upd, rowmax, best)
            bi = jnp.where(upd, i_now, bi)
            bo = jnp.where(upd, rowarg, bo)
        return h, e, best, bi, bo

    h0 = jnp.zeros((W, R), jnp.int32)
    e0 = jnp.full((W, R), _NEG, jnp.int32)
    z = jnp.zeros((1, R), jnp.int32)
    h, e, best, bi, bo = jax.lax.fori_loop(
        0, L_pad // 8, outer, (h0, e0, z, z, z)
    )
    score_ref[0, 0, :] = best[0]
    ei_ref[0, 0, :] = bi[0]
    eo_ref[0, 0, :] = bo[0]


@functools.partial(jax.jit, static_argnames=("band", "interpret", "simple"))
def banded_sw_score_pallas(
    query: jax.Array,   # [S, L] codes
    qlen: jax.Array,    # [S] int32
    ref: jax.Array,     # [S, T] codes, T = L + band
    matrix: jax.Array,  # [M, 8, 8] or [8, 8] int32
    gopen_q: jax.Array,
    gopen_r: jax.Array,
    gext: jax.Array,
    msel: jax.Array | None = None,
    *,
    band: int,
    interpret: bool = False,
    simple: bool = False,
) -> ScoreResult:
    """Drop-in for ops/sw_ref.banded_sw_score; W (=band) must be a multiple
    of 8. The lazy-F doubling chain scales to any W (log2(W) shift steps),
    so long-read corridors (W=120/184) run this kernel too."""
    S, L = query.shape
    W = band
    assert W % 8 == 0, "band must be a multiple of 8 for the Pallas kernel"
    T = ref.shape[1]
    L_pad = _round8(L)
    S_pad = ((S + _R - 1) // _R) * _R
    T_pad = _round8(L_pad + W + 8)

    def pad_to(x, rows, cols, fill):
        return jnp.pad(
            x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])),
            constant_values=fill,
        )

    qT = pad_to(query.astype(jnp.uint8), S_pad, L_pad, 4).T      # [L_pad, S_pad]
    corrT = pad_to(ref.astype(jnp.uint8), S_pad, T_pad, 4).T     # [T_pad, S_pad]
    nb = S_pad // _R
    qlen2 = jnp.pad(qlen.astype(jnp.int32), (0, S_pad - S)).reshape(nb, 1, _R)
    ms = (
        jnp.zeros((S,), jnp.int32) if msel is None else msel.astype(jnp.int32)
    )
    ms2 = jnp.pad(ms, (0, S_pad - S)).reshape(nb, 1, _R)
    flat = matrix.reshape(-1).astype(jnp.int32)
    n_mats = flat.shape[0] // 64
    mats_pad = jnp.pad(flat, (0, 128 - flat.shape[0]))
    gaps = jnp.stack([
        gopen_q.astype(jnp.int32), gopen_r.astype(jnp.int32),
        gext.astype(jnp.int32),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # mats, gaps land in SMEM
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L_pad, _R), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, _R), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        # the coefficient-plane scratch is only needed on the general path
        scratch_shapes=[pltpu.VMEM(
            (1, 8, _R) if simple else (5, L_pad, _R), jnp.int32
        )],
    )
    score, ei, eo = pl.pallas_call(
        functools.partial(
            _kernel, L=L, L_pad=L_pad, W=W, n_mats=n_mats, simple=simple
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, 1, _R), jnp.int32)] * 3,
        interpret=interpret,
    )(mats_pad, gaps, qT, corrT, qlen2, ms2)
    return ScoreResult(
        score.reshape(-1)[:S], ei.reshape(-1)[:S], eo.reshape(-1)[:S]
    )
