"""Pallas SW score kernel == reference jax.lax kernel, bit-exact
(SURVEY.md §7 M5: Pallas kernels oracle-tested against the reference impl)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.ops.scoring import score_matrix
from nextgenmap_tpu.ops.sw_pallas import banded_sw_score_pallas
from nextgenmap_tpu.ops.sw_ref import banded_sw_score

W = 48


def _run_both(q, lens, r, mats, msel, gaps=(20, 20, 20)):
    args = (
        jnp.asarray(q), jnp.asarray(lens, jnp.int32), jnp.asarray(r),
        jnp.asarray(mats),
        jnp.int32(gaps[0]), jnp.int32(gaps[1]), jnp.int32(gaps[2]),
        jnp.asarray(msel, jnp.int32),
    )
    ref = banded_sw_score(*args, band=W)
    pal = banded_sw_score_pallas(*args, band=W, interpret=True)
    return ref, pal


def _assert_equal(ref, pal):
    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(pal.score))
    np.testing.assert_array_equal(np.asarray(ref.end_i), np.asarray(pal.end_i))
    np.testing.assert_array_equal(np.asarray(ref.end_o), np.asarray(pal.end_o))


def test_pallas_score_matches_reference_random():
    rng = np.random.default_rng(0)
    S, L = 16, 100
    cfg = NgmConfig()
    mats = np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)])
    q = rng.integers(0, 4, (S, L)).astype(np.uint8)
    r = rng.integers(0, 5, (S, L + W)).astype(np.uint8)
    # plant exact matches for half the rows so real alignments exist
    for i in range(0, S, 2):
        o = int(rng.integers(0, W))
        r[i, o : o + L] = q[i]
    lens = rng.integers(20, L + 1, S).astype(np.int32)
    msel = rng.integers(0, 2, S).astype(np.int32)
    _assert_equal(*_run_both(q, lens, r, mats, msel))


def test_pallas_score_odd_lengths_and_sizes():
    rng = np.random.default_rng(1)
    S, L = 5, 73  # non-multiples of block sizes
    cfg = NgmConfig(match_bonus=7, mismatch_penalty=11)
    mats = score_matrix(cfg, 0)[None]
    q = rng.integers(0, 4, (S, L)).astype(np.uint8)
    r = rng.integers(0, 4, (S, L + W)).astype(np.uint8)
    r[0, 10 : 10 + L] = q[0]
    lens = np.array([L, 0, 31, L, 8], np.int32)
    msel = np.zeros(S, np.int32)
    _assert_equal(*_run_both(q, lens, r, mats, msel))


def test_pallas_score_asymmetric_gaps():
    rng = np.random.default_rng(2)
    S, L = 8, 64
    cfg = NgmConfig(gap_read_penalty=25, gap_ref_penalty=30,
                    gap_extend_penalty=12)
    mats = np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)])
    q = rng.integers(0, 4, (S, L)).astype(np.uint8)
    r = rng.integers(0, 4, (S, L + W)).astype(np.uint8)
    for i in range(S):
        seg = q[i, : L - 6]
        r[i, 5 : 5 + seg.shape[0]] = seg  # near-full-length hit
    lens = np.full(S, L, np.int32)
    msel = rng.integers(0, 2, S).astype(np.int32)
    _assert_equal(*_run_both(q, lens, r, mats, msel, gaps=(25, 30, 12)))


def test_pallas_simple_matrix_fast_path():
    """simple=True (match/mismatch matrix, the default mode) must be
    bit-identical to the general coefficient-plane path in BOTH kernels."""
    rng = np.random.default_rng(7)
    S, L = 16, 100
    cfg = NgmConfig()
    mats = np.stack([score_matrix(cfg, 0), score_matrix(cfg, 1)])
    from nextgenmap_tpu.ops.scoring import matrices_are_simple

    assert matrices_are_simple(mats)
    # bisulfite matrices are NOT simple (asymmetric tolerance entry)
    assert not matrices_are_simple(
        np.stack([score_matrix(cfg.replace(bs_mapping=True), 0),
                  score_matrix(cfg.replace(bs_mapping=True), 1)])
    )
    q = rng.integers(0, 5, (S, L)).astype(np.uint8)  # include N codes
    r = rng.integers(0, 5, (S, L + W)).astype(np.uint8)
    for i in range(0, S, 2):
        o = int(rng.integers(0, W))
        r[i, o : o + L] = q[i]
    lens = rng.integers(20, L + 1, S).astype(np.int32)
    msel = rng.integers(0, 2, S).astype(np.int32)
    args = (
        jnp.asarray(q), jnp.asarray(lens, jnp.int32), jnp.asarray(r),
        jnp.asarray(mats), jnp.int32(20), jnp.int32(20), jnp.int32(20),
        jnp.asarray(msel, jnp.int32),
    )
    ref = banded_sw_score(*args, band=W)
    ref_s = banded_sw_score(*args, band=W, simple=True)
    pal_s = banded_sw_score_pallas(*args, band=W, interpret=True, simple=True)
    _assert_equal(ref, ref_s)
    _assert_equal(ref, pal_s)

    from nextgenmap_tpu.ops.sw_ref import banded_sw_align

    al = banded_sw_align(*args, band=W)
    al_s = banded_sw_align(*args, band=W, simple=True)
    for f in al._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(al, f)), np.asarray(getattr(al_s, f)), f
        )


@pytest.mark.parametrize("wide", [120, 184])
@pytest.mark.parametrize("simple", [False, True])
def test_pallas_wide_band_long_gap_runs(wide, simple):
    """W>64 bands must propagate lazy-F across the FULL band span.

    Regression: the doubling chain used to stop at span 63, silently
    underestimating scores for gap runs >=64 band offsets (reads with a
    large deletion whose two anchors sit ~W apart in the corridor) —
    exactly the long-read corridors (W=120/184) of the 1000 bp path."""
    rng = np.random.default_rng(11)
    S, L = 8, 200
    cfg = NgmConfig()
    mats = np.stack([score_matrix(cfg, 0)])
    q = rng.integers(0, 4, (S, L)).astype(np.uint8)
    r = rng.integers(0, 4, (S, L + wide)).astype(np.uint8)
    for i in range(S):
        o2 = wide - 8  # second anchor nearly a full band away
        r[i, 0 : L // 2] = q[i, : L // 2]
        r[i, o2 + L // 2 : o2 + L] = q[i, L // 2 :]
    lens = np.full(S, L, np.int32)
    msel = np.zeros(S, np.int32)
    args = (
        jnp.asarray(q), jnp.asarray(lens, jnp.int32), jnp.asarray(r),
        jnp.asarray(mats), jnp.int32(20), jnp.int32(20), jnp.int32(3),
        jnp.asarray(msel, jnp.int32),
    )
    ref = banded_sw_score(*args, band=wide, simple=simple)
    pal = banded_sw_score_pallas(
        *args, band=wide, interpret=True, simple=simple
    )
    _assert_equal(ref, pal)
