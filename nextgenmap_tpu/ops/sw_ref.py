"""Banded Smith-Waterman — reference JAX implementation (score + traceback).

Reference analog: the OpenCL corridor-SW kernels SWOcl (score only,
ref:src/SWOcl.cpp) and SWOclCigar (traceback, ref:src/SWOclCigar.cpp), and
the SSE CPU backend that plays the same role (SURVEY.md §2 components 18-20).
This module is the pure-jax.lax "CPU backend" of our stack: it runs on any
JAX backend, defines the exact semantics the Pallas kernels must reproduce
bit-for-bit, and is itself oracle-tested against a scalar NumPy DP.

Band parametrization: query row i (0-based), band offset o in [0, W);
the corridor ref slice is laid out so ref index j = i + o.  A corridor of
length T = L + W therefore covers the whole band.  In these coordinates the
classic moves become:

  diag  (i-1, j-1) -> same offset o in the previous row
  up    (i-1, j)   -> offset o+1 in the previous row   (gap: query consumed, "I")
  left  (i,   j-1) -> offset o-1 in the same row       (gap: ref consumed, "D")

The left/F dependency inside a row is resolved with an associative max-scan
("lazy-F" trick): chains H->F->F… collapse exactly when gap_open >= gap_extend
(enforced by NgmConfig.validate), so

  F[o] = max_{t<o}( Htmp[t] + t*gext ) - gopen - (o-1)*gext

with Htmp = max(0, diag, E).  NGM's defaults (open == extend == 20) make the
affine recurrence collapse to linear gaps, so this one kernel covers both the
default and --affine modes.

DP is int32 throughout => tests assert exact equality (SURVEY.md §4 item 2).
Tie-breaks per DESIGN.md rule 10: stop > diag > up(E) > left(F); gap states
prefer open over extend on equal score; the global best cell prefers smallest
(i, then j).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# plain int (NOT an eager jnp scalar: creating a JAX array at import time
# initializes the XLA backend, which breaks jax.distributed.initialize for
# any process that imports this module first)
NEG = -(2**30)

# traceback op codes (match SAM CIGAR semantics)
OP_M, OP_I, OP_D = 0, 1, 2
OP_NONE = 255

# dir byte layout: bits 0-1 H-source (0 stop, 1 diag, 2 E/up, 3 F/left),
# bit 2: E extends (vs opens), bit 3: F extends (vs opens),
# bit 4: exact base match at this cell (lets the backwalk skip re-reading
# query/ref — every per-step gather in the walk is a TPU serialization point)


class ScoreResult(NamedTuple):
    score: jax.Array   # [B] int32 best local score (0 = no alignment)
    end_i: jax.Array   # [B] int32 query index of the best cell
    end_o: jax.Array   # [B] int32 band offset of the best cell (ref j = i + o)


class AlignResult(NamedTuple):
    score: jax.Array     # [B] int32
    q_start: jax.Array   # [B] first aligned query base (soft-clip before)
    q_end: jax.Array     # [B] last aligned query base (inclusive)
    r_start: jax.Array   # [B] first aligned corridor ref index
    r_end: jax.Array     # [B] last aligned corridor ref index (inclusive)
    ops: jax.Array       # [B, max_ops] uint8, alignment ops END->START, OP_NONE-filled
    n_ops: jax.Array     # [B] int32
    matches: jax.Array   # [B] int32 exact base matches
    mismatches: jax.Array  # [B] int32 aligned-but-different bases
    indels: jax.Array    # [B] int32 total gap length



def _sub_scores(flat, n_mats, moff, qi, rw):
    """Substitution scores without a gather.

    TPU gathers are element-serial, and the naive `flat[qi*8 + rw]` lookup
    inside the row scan dominated the whole kernel (~80% of map_step time).
    The alphabet is 5 codes and the matrix count is tiny and static, so the
    lookup is instead built from vector compares/selects: per row compute
    Rq[c] = S[msel, qi, c] with M*25 scalar-coefficient selects on [B], then
    combine over the ref codes with 5 selects on [B, W].
    """
    sub = jnp.zeros(rw.shape, jnp.int32)
    for c in range(5):
        rqc = jnp.zeros(qi.shape, jnp.int32)
        for m in range(n_mats):
            base = m * 64
            for a in range(5):
                coef = flat[base + a * 8 + c]
                sel = (qi == a) if n_mats == 1 else ((qi == a) & (moff == base))
                rqc = rqc + jnp.where(sel, coef, 0)
        sub = sub + jnp.where(rw == c, rqc[:, None], 0)
    return sub

def _row_step(sub, h_prev, e_prev, gopen_q, gopen_r, gext, local=True):
    """One DP row. Returns (h, e, htmp-F decomposition pieces for dirs).

    local=False is the --end-to-end (glocal) recurrence: no 0 floor, so the
    whole query must be consumed (row 0's zero h_prev still gives a free ref
    start anywhere in the corridor).
    """
    B, W = sub.shape
    # diag: previous row, same offset
    hd = h_prev + sub
    # E (up): previous row, offset o+1
    h_up = jnp.concatenate([h_prev[:, 1:], jnp.full((B, 1), NEG, h_prev.dtype)], axis=1)
    e_up = jnp.concatenate([e_prev[:, 1:], jnp.full((B, 1), NEG, e_prev.dtype)], axis=1)
    e_open = h_up - gopen_q
    e_ext = e_up - gext
    e = jnp.maximum(e_open, e_ext)
    base = jnp.maximum(0, hd) if local else hd
    htmp = jnp.maximum(base, e)
    # F (left) via exclusive max-scan of Htmp[t] + t*gext
    off = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    a = htmp + off * gext
    cm = jax.lax.associative_scan(jnp.maximum, a, axis=1)
    cm_excl = jnp.concatenate([jnp.full((B, 1), NEG, cm.dtype), cm[:, :-1]], axis=1)
    f = cm_excl - gopen_r - (off - 1) * gext
    h = jnp.maximum(htmp, f)
    return h, e, hd, f, e_ext, e_open


def _dirs(h, hd, e, f, e_ext_term, e_open_term, f_prev_ext, f_prev_open, mbit,
          local=True):
    """Pack the direction byte per cell (tie-breaks per DESIGN.md rule 10).

    glocal (--end-to-end) cells never encode "stop": the backwalk runs until
    the query is exhausted (row -1), not until the score hits 0.
    """
    src = jnp.where(h == hd, 1, jnp.where(h == e, 2, 3))
    d = (jnp.where(h <= 0, 0, src) if local else src).astype(jnp.uint8)
    e_bit = (e_ext_term > e_open_term).astype(jnp.uint8) << 2
    f_bit = (f_prev_ext > f_prev_open).astype(jnp.uint8) << 3
    m_bit = mbit.astype(jnp.uint8) << 4
    return d | e_bit | f_bit | m_bit


@partial(jax.jit, static_argnames=("band", "mode"))
def banded_sw_score(
    query: jax.Array,   # [B, L] int32/uint8 codes
    qlen: jax.Array,    # [B] int32
    ref: jax.Array,     # [B, T] codes, T = L + band
    matrix: jax.Array,  # [8, 8] int32
    gopen_q: jax.Array,  # scalar int32: penalty opening a gap consuming query (I)
    gopen_r: jax.Array,  # scalar int32: penalty opening a gap consuming ref (D)
    gext: jax.Array,     # scalar int32
    msel: jax.Array | None = None,  # [B] int32 matrix index (e.g. bisulfite strand)
    *,
    band: int,
    mode: str = "local",
) -> ScoreResult:
    """Score-only banded SW over a batch. ~L sequential steps of [B, W] VPU work.

    `matrix` may be [8,8] (shared) or [M,8,8] with per-row selector `msel`.
    mode="glocal" (--end-to-end): whole query consumed, best cell taken from
    the last query row only; score <= 0 reports as 0 (unalignable).
    """
    local = mode == "local"
    B, L = query.shape
    W = band
    q = query.astype(jnp.int32)
    r = ref.astype(jnp.int32)
    flat = matrix.reshape(-1)
    n_mats = flat.shape[0] // 64
    moff = jnp.zeros((B,), jnp.int32) if msel is None else msel.astype(jnp.int32) * 64

    # lax.scan over rows; slices of q and r per row
    def body(carry, i):
        h_prev, e_prev, best, bi, bo = carry
        qi = jax.lax.dynamic_slice_in_dim(q, i, 1, axis=1)[:, 0]          # [B]
        rw = jax.lax.dynamic_slice_in_dim(r, i, W, axis=1)                # [B, W]
        sub = _sub_scores(flat, n_mats, moff, qi, rw)
        h, e, *_ = _row_step(sub, h_prev, e_prev, gopen_q, gopen_r, gext, local)
        valid = ((i < qlen) if local else (i == qlen - 1))[:, None]
        h_m = jnp.where(valid, h, NEG)
        rowmax = jnp.maximum(jnp.max(h_m, axis=1), 0)
        rowarg = jnp.argmax(h_m, axis=1).astype(jnp.int32)
        upd = rowmax > best
        best = jnp.where(upd, rowmax, best)
        bi = jnp.where(upd, i, bi)
        bo = jnp.where(upd, rowarg, bo)
        return (h, e, best, bi, bo), None

    h0 = jnp.zeros((B, W), jnp.int32)
    e0 = jnp.full((B, W), NEG, jnp.int32)
    init = (h0, e0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    (h, e, best, bi, bo), _ = jax.lax.scan(body, init, jnp.arange(L, dtype=jnp.int32))
    return ScoreResult(best, bi, bo)


@partial(jax.jit, static_argnames=("band", "max_ops", "mode"))
def banded_sw_align(
    query: jax.Array,
    qlen: jax.Array,
    ref: jax.Array,
    matrix: jax.Array,
    gopen_q: jax.Array,
    gopen_r: jax.Array,
    gext: jax.Array,
    msel: jax.Array | None = None,
    *,
    band: int,
    max_ops: int = 0,
    mode: str = "local",
) -> AlignResult:
    """Banded SW with full traceback: direction matrix + vectorized backwalk.

    The direction matrix is [B, L, W] uint8 (the Pallas version packs this
    tighter); the backwalk is a lax.while_loop of at most L+W steps with [B]
    gathers per step — only alignment survivors should be fed here.
    mode="glocal" (--end-to-end): whole query consumed, no clipping; the
    backwalk ends when the query is exhausted instead of at a 0 cell.
    """
    local = mode == "local"
    B, L = query.shape
    W = band
    MO = max_ops or (L + W)
    q = query.astype(jnp.int32)
    r = ref.astype(jnp.int32)
    flat = matrix.reshape(-1)
    n_mats = flat.shape[0] // 64
    moff = jnp.zeros((B,), jnp.int32) if msel is None else msel.astype(jnp.int32) * 64

    def body(carry, i):
        h_prev, e_prev, best, bi, bo = carry
        qi = jax.lax.dynamic_slice_in_dim(q, i, 1, axis=1)[:, 0]
        rw = jax.lax.dynamic_slice_in_dim(r, i, W, axis=1)
        sub = _sub_scores(flat, n_mats, moff, qi, rw)
        B_, W_ = sub.shape
        hd = h_prev + sub
        h_up = jnp.concatenate([h_prev[:, 1:], jnp.full((B_, 1), NEG, jnp.int32)], axis=1)
        e_up = jnp.concatenate([e_prev[:, 1:], jnp.full((B_, 1), NEG, jnp.int32)], axis=1)
        e_open = h_up - gopen_q
        e_ext = e_up - gext
        e = jnp.maximum(e_open, e_ext)
        base = jnp.maximum(0, hd) if local else hd
        htmp = jnp.maximum(base, e)
        off = jax.lax.broadcasted_iota(jnp.int32, (B_, W_), 1)
        a = htmp + off * gext
        cm = jax.lax.associative_scan(jnp.maximum, a, axis=1)
        cm_excl = jnp.concatenate([jnp.full((B_, 1), NEG, jnp.int32), cm[:, :-1]], axis=1)
        f = cm_excl - gopen_r - (off - 1) * gext
        h = jnp.maximum(htmp, f)
        # F source bits: F[o] extends F[o-1] vs opens from Htmp[o-1] (strict:
        # prefer open on tie)
        f_left = jnp.concatenate([jnp.full((B_, 1), NEG, jnp.int32), f[:, :-1]], axis=1)
        htmp_left = jnp.concatenate([jnp.full((B_, 1), NEG, jnp.int32), htmp[:, :-1]], axis=1)
        mbit = (qi[:, None] == rw) & (qi[:, None] < 4)
        dirs = _dirs(h, hd, e, f, e_ext, e_open, f_left - gext,
                     htmp_left - gopen_r, mbit, local)
        valid = ((i < qlen) if local else (i == qlen - 1))[:, None]
        h_m = jnp.where(valid, h, NEG)
        rowmax = jnp.maximum(jnp.max(h_m, axis=1), 0)
        rowarg = jnp.argmax(h_m, axis=1).astype(jnp.int32)
        upd = rowmax > best
        best = jnp.where(upd, rowmax, best)
        bi = jnp.where(upd, i, bi)
        bo = jnp.where(upd, rowarg, bo)
        return (h, e, best, bi, bo), dirs

    h0 = jnp.zeros((B, W), jnp.int32)
    e0 = jnp.full((B, W), NEG, jnp.int32)
    init = (h0, e0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    (_, _, best, bi, bo), dirs = jax.lax.scan(body, init, jnp.arange(L, dtype=jnp.int32))
    dirs = jnp.transpose(dirs, (1, 0, 2))  # [B, L, W]
    # stays uint8: the backwalk re-reads this [B, L*W] array from HBM every
    # step (the masked-sum fetch), so its BYTE width is the walk's bandwidth
    # bill — int32 here measured 4x slower end-to-end on v5e
    dflat = dirs.reshape(B, L * W)

    # ---- vectorized backwalk (fixed-length scan, no per-step gathers) ----
    # Every active step emits exactly one op: an H-cell whose source is E/F
    # emits the first gap op immediately and continues in the gap phase iff
    # the cell's extend bit is set (collapsing the old transition steps).
    # The direction byte is fetched with a dense masked sum over [B, L*W]
    # (VPU work) instead of a [B]-element gather per step — element gathers
    # inside device loops are the single worst TPU serialization pattern.
    PH_H, PH_E, PH_F = 0, 1, 2
    LW = L * W
    col = jax.lax.broadcasted_iota(jnp.int32, (B, LW), 1)

    def step(st, _):
        i, o, ph = st["i"], st["o"], st["ph"]
        inb = (i >= 0) & (i < L) & (o >= 0) & (o < W)
        idx = jnp.clip(i * W + o, 0, LW - 1)
        d = jnp.sum(
            jnp.where((col == idx[:, None]) & inb[:, None], dflat, 0)
            .astype(jnp.int32),
            axis=1,
        )
        hsrc = d & 3
        active = st["active"] & inb & ((ph != PH_H) | (hsrc != 0))

        is_m = active & (ph == PH_H) & (hsrc == 1)
        is_i = active & ((ph == PH_E) | ((ph == PH_H) & (hsrc == 2)))
        is_d = active & ((ph == PH_F) | ((ph == PH_H) & (hsrc == 3)))

        op = jnp.where(
            is_m, OP_M, jnp.where(is_i, OP_I, jnp.where(is_d, OP_D, OP_NONE))
        ).astype(jnp.uint8)

        m_hit = is_m & ((d >> 4) & 1 == 1)
        matches = st["matches"] + m_hit.astype(jnp.int32)
        mismatches = st["mismatches"] + (is_m & ~m_hit).astype(jnp.int32)
        indels = st["indels"] + (is_i | is_d).astype(jnp.int32)

        ni = jnp.where(is_m | is_i, i - 1, i)
        no = jnp.where(is_i, o + 1, jnp.where(is_d, o - 1, o))
        e_bit = (d >> 2) & 1
        f_bit = (d >> 3) & 1
        nph = jnp.where(
            is_m, PH_H,
            jnp.where(is_i, jnp.where(e_bit == 1, PH_E, PH_H),
                      jnp.where(is_d, jnp.where(f_bit == 1, PH_F, PH_H), ph)),
        )
        # record the last consumed cell to derive start coordinates
        qs = jnp.where(is_m | is_i, i, st["qs"])
        rs = jnp.where(is_m | is_d, i + o, st["rs"])
        nst = {
            "i": jnp.where(active, ni, i), "o": jnp.where(active, no, o),
            "ph": jnp.where(active, nph, ph), "active": active,
            "nops": st["nops"] + active.astype(jnp.int32),
            "matches": matches, "mismatches": mismatches, "indels": indels,
            "qs": qs, "rs": rs,
        }
        return nst, op

    st0 = {
        "i": bi, "o": bo, "ph": jnp.zeros(B, jnp.int32),
        "active": best > 0,
        "nops": jnp.zeros(B, jnp.int32),
        "matches": jnp.zeros(B, jnp.int32),
        "mismatches": jnp.zeros(B, jnp.int32),
        "indels": jnp.zeros(B, jnp.int32),
        "qs": bi, "rs": bi + bo,
    }
    st, ops_steps = jax.lax.scan(step, st0, None, length=MO)
    ops = jnp.transpose(ops_steps, (1, 0))  # [B, MO], END->START, no holes
    return AlignResult(
        score=best,
        q_start=st["qs"], q_end=bi,
        r_start=st["rs"], r_end=bi + bo,
        ops=ops, n_ops=st["nops"],
        matches=st["matches"], mismatches=st["mismatches"], indels=st["indels"],
    )
