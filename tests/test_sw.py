"""Banded-SW kernel tests vs the scalar NumPy oracle (exact integer equality).

SURVEY.md §4 item 2: property tests over random sequence pairs and random
score matrices (incl. asymmetric bisulfite/slam ones).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.ops.scoring import score_matrix
from nextgenmap_tpu.ops.sw_ref import banded_sw_align, banded_sw_score
from tests.oracle_sw import banded_sw_oracle, cigar_from_ops

CFG = NgmConfig()
MAT = score_matrix(CFG)


LPAD = 64  # fixed padded query length => one compile per (band, penalties)


def run_both(query, ref, band, matrix=MAT, gq=20, gr=20, ge=20, qlen=None):
    """Pad to a fixed [LPAD, LPAD+band] shape (exercises qlen masking) and run
    device kernel + oracle on the identical padded arrays."""
    L = len(query)
    assert len(ref) == L + band and L <= LPAD
    qlen = qlen if qlen is not None else L
    qp = np.full(LPAD, 4, np.uint8)
    qp[:L] = query
    rp = np.full(LPAD + band, 4, np.uint8)
    rp[: L + band] = ref
    res = banded_sw_score(
        jnp.asarray(qp)[None], jnp.asarray([qlen], jnp.int32), jnp.asarray(rp)[None],
        jnp.asarray(matrix), jnp.int32(gq), jnp.int32(gr), jnp.int32(ge), band=band,
    )
    oracle = banded_sw_oracle(qp, qlen, rp, matrix, gq, gr, ge, band)
    return res, oracle


def test_perfect_match():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 80).astype(np.uint8)
    q = ref[8:48].copy()
    W = 16
    corridor = ref[8 : 8 + 40 + W]
    res, oracle = run_both(q, corridor, W)
    assert int(res.score[0]) == 40 * CFG.match_bonus == oracle["score"]
    assert int(res.end_i[0]) == oracle["end_i"] == 39
    assert int(res.end_o[0]) == oracle["end_o"] == 0


def test_mismatches_and_gaps_vs_oracle():
    rng = np.random.default_rng(1)
    for trial in range(30):
        L = int(rng.integers(20, 60))
        W = int(rng.choice([8, 16, 24]))
        ref = rng.integers(0, 4, L + W).astype(np.uint8)
        q = ref[W // 2 : W // 2 + L].copy()
        # mutate
        n_mut = int(rng.integers(0, L // 4))
        for _ in range(n_mut):
            p = int(rng.integers(0, L))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        # small indel
        if rng.random() < 0.5 and L > 10:
            p = int(rng.integers(2, L - 4))
            q = np.concatenate([q[:p], q[p + 1 :], rng.integers(0, 4, 1).astype(np.uint8)])
        res, oracle = run_both(q, ref, W)
        assert int(res.score[0]) == oracle["score"], f"trial {trial}"
        assert int(res.end_i[0]) == oracle["end_i"], f"trial {trial}"
        assert int(res.end_o[0]) == oracle["end_o"], f"trial {trial}"


def test_random_property_exact():
    rng = np.random.default_rng(2)
    for trial in range(40):
        L = int(rng.integers(10, 50))
        W = int(rng.choice([8, 16]))
        q = rng.integers(0, 5, L).astype(np.uint8)   # includes N
        ref = rng.integers(0, 5, L + W).astype(np.uint8)
        gq, gr, ge = int(rng.integers(5, 30)), int(rng.integers(5, 30)), int(rng.integers(2, 15))
        ge = min(ge, gq, gr)  # scan-trick precondition
        res, oracle = run_both(q, ref, W, gq=gq, gr=gr, ge=ge)
        assert int(res.score[0]) == oracle["score"], f"trial {trial}"


def test_asymmetric_matrices():
    rng = np.random.default_rng(3)
    bs = score_matrix(NgmConfig(bs_mapping=True), strand=0)
    slam = score_matrix(NgmConfig(slam_seq=2))
    for matrix in (bs, slam):
        for trial in range(10):
            L, W = 30, 16
            ref = rng.integers(0, 4, L + W).astype(np.uint8)
            q = ref[4 : 4 + L].copy()
            # bisulfite-style conversions C->T
            conv = (q == 1) & (rng.random(L) < 0.5)
            q = np.where(conv, 3, q).astype(np.uint8)
            res, oracle = run_both(q, ref, W, matrix=matrix)
            assert int(res.score[0]) == oracle["score"]


def test_align_matches_oracle_cigar():
    rng = np.random.default_rng(4)
    for trial in range(25):
        L = int(rng.integers(20, 60))
        W = 16
        ref = rng.integers(0, 4, L + W).astype(np.uint8)
        q = ref[3 : 3 + L].copy()
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, L))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.6 and L > 12:
            p = int(rng.integers(2, L - 6))
            if rng.random() < 0.5:  # deletion from query
                q = np.concatenate([q[:p], q[p + 1 :], rng.integers(0, 4, 1).astype(np.uint8)])
            else:  # insertion into query
                q = np.concatenate([q[:p], rng.integers(0, 4, 1).astype(np.uint8), q[:L][p:-1]])
        q = q[:L]
        qp = np.full(LPAD, 4, np.uint8)
        qp[:L] = q
        rp = np.full(LPAD + W, 4, np.uint8)
        rp[: L + W] = ref
        res = banded_sw_align(
            jnp.asarray(qp)[None], jnp.asarray([L], jnp.int32), jnp.asarray(rp)[None],
            jnp.asarray(MAT), jnp.int32(20), jnp.int32(20), jnp.int32(20), band=W,
        )
        oracle = banded_sw_oracle(qp, L, rp, MAT, 20, 20, 20, W)
        assert int(res.score[0]) == oracle["score"], f"trial {trial}"
        n = int(res.n_ops[0])
        dev_ops = res.ops[0, :n].tolist()
        assert dev_ops == oracle["ops"], f"trial {trial}"
        assert int(res.q_start[0]) == oracle["q_start"]
        assert int(res.q_end[0]) == oracle["q_end"]
        assert int(res.r_start[0]) == oracle["r_start"]
        assert int(res.r_end[0]) == oracle["r_end"]
        assert int(res.matches[0]) == oracle["matches"]
        assert int(res.mismatches[0]) == oracle["mismatches"]
        assert int(res.indels[0]) == oracle["indels"]


def test_align_batch_consistency():
    """Batched result equals per-item results (batch invariance)."""
    rng = np.random.default_rng(5)
    L, W, B = 40, 16, 8
    refs = rng.integers(0, 4, (B, L + W)).astype(np.uint8)
    qs = np.stack([refs[b, 5 : 5 + L] for b in range(B)]).copy()
    qs[:, 10] = (qs[:, 10] + 1) % 4
    qlens = np.full(B, L, np.int32)
    batched = banded_sw_align(
        jnp.asarray(qs), jnp.asarray(qlens), jnp.asarray(refs),
        jnp.asarray(MAT), jnp.int32(20), jnp.int32(20), jnp.int32(20), band=W,
    )
    for b in range(B):
        single = banded_sw_align(
            jnp.asarray(qs[b])[None], jnp.asarray([L], jnp.int32), jnp.asarray(refs[b])[None],
            jnp.asarray(MAT), jnp.int32(20), jnp.int32(20), jnp.int32(20), band=W,
        )
        assert int(batched.score[b]) == int(single.score[0])
        nb, ns = int(batched.n_ops[b]), int(single.n_ops[0])
        assert nb == ns
        assert batched.ops[b, :nb].tolist() == single.ops[0, :ns].tolist()


def test_backwalk_op_buffer_clamp():
    """A walk longer than max_ops must clamp n_ops to the buffer and raise
    the trunc flag (ADVICE round-2: unclamped cursor let downstream
    formatters read past the ops row)."""
    rng = np.random.default_rng(6)
    L, W = 40, 16
    ref = rng.integers(0, 4, L + W).astype(np.uint8)
    q = ref[4 : 4 + L].copy()
    full = banded_sw_align(
        jnp.asarray(q)[None], jnp.asarray([L], jnp.int32), jnp.asarray(ref)[None],
        jnp.asarray(MAT), jnp.int32(20), jnp.int32(20), jnp.int32(20), band=W,
    )
    n_full = int(full.n_ops[0])
    assert n_full > 4 and not bool(full.trunc[0])
    cut = banded_sw_align(
        jnp.asarray(q)[None], jnp.asarray([L], jnp.int32), jnp.asarray(ref)[None],
        jnp.asarray(MAT), jnp.int32(20), jnp.int32(20), jnp.int32(20), band=W,
        max_ops=4,
    )
    assert int(cut.n_ops[0]) <= 4          # never exceeds the buffer
    assert bool(cut.trunc[0])              # and the overflow is flagged


def test_cigar_string_helper():
    from tests.oracle_sw import OP_D, OP_I, OP_M

    # end->start ops: [M M I M] reversed is M I M M
    s = cigar_from_ops([OP_M, OP_M, OP_I, OP_M], q_start=2, q_end=6, qlen=10)
    assert s == "2S1M1I2M3S"


def test_align_cigar_multi_indel_affine():
    """Long deletion/insertion RUNS with true affine gaps (extend < open):
    exercises the row-walk's in-row D-run resolution and PH_E/PH_F chains
    (the old per-step walk was replaced by the row-synchronized walk)."""
    rng = np.random.default_rng(77)
    for trial in range(40):
        L = int(rng.integers(30, 61))
        W = int(rng.choice([16, 24]))
        ref = rng.integers(0, 4, L + W).astype(np.uint8)
        q = ref[2 : 2 + L].copy()
        # one or two long indels (up to W-4 bases)
        for _ in range(int(rng.integers(1, 3))):
            glen = int(rng.integers(2, max(3, W - 4)))
            p = int(rng.integers(5, L - glen - 5))
            if rng.random() < 0.5:  # deletion from query (D run)
                q = np.concatenate([
                    q[:p], q[p + glen:], rng.integers(0, 4, glen).astype(np.uint8)
                ])[:L]
            else:                   # insertion into query (I run)
                q = np.concatenate([
                    q[:p], rng.integers(0, 4, glen).astype(np.uint8), q[p:]
                ])[:L]
        # a few SNPs on top
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, L))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        gq, gr = int(rng.integers(15, 30)), int(rng.integers(15, 30))
        ge = int(rng.integers(2, 8))  # extend << open: affine chains
        qp = np.full(LPAD, 4, np.uint8)
        qp[:L] = q
        rp = np.full(LPAD + W, 4, np.uint8)
        rp[: L + W] = ref
        res = banded_sw_align(
            jnp.asarray(qp)[None], jnp.asarray([L], jnp.int32), jnp.asarray(rp)[None],
            jnp.asarray(MAT), jnp.int32(gq), jnp.int32(gr), jnp.int32(ge), band=W,
        )
        oracle = banded_sw_oracle(qp, L, rp, MAT, gq, gr, ge, W)
        assert int(res.score[0]) == oracle["score"], f"trial {trial}"
        n = int(res.n_ops[0])
        assert res.ops[0, :n].tolist() == oracle["ops"], f"trial {trial}"
        for f in ("q_start", "q_end", "r_start", "r_end",
                  "matches", "mismatches", "indels"):
            assert int(getattr(res, f)[0]) == oracle[f], (trial, f)
