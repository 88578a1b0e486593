"""Single-buffer wire fetch (utils/wire.py): bit-exact round trip and
CLI byte-identity with the per-leaf fetch path."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nextgenmap_tpu.utils.wire import fetch_packed


def test_roundtrip_mixed_dtypes():
    rng = np.random.default_rng(0)
    tree = {
        "b": rng.integers(0, 2, (7,)).astype(bool),
        "i8": rng.integers(0, 255, (3, 5)).astype(np.uint8),
        "i16": rng.integers(-30000, 30000, (4,)).astype(np.int16),
        "i32": rng.integers(-(2**31), 2**31 - 1, (2, 3)).astype(np.int32),
        "f32": rng.standard_normal((6,)).astype(np.float32),
        "scalar": np.int32(-12345),
    }
    dev = {k: jnp.asarray(v) for k, v in tree.items()}
    out = fetch_packed(dev)
    for k, v in tree.items():
        got = np.asarray(out[k])
        np.testing.assert_array_equal(got, v, err_msg=k)
        assert got.dtype == v.dtype
    # int() works on scalar leaves (runner uses int(res.cmr_overflow))
    assert int(out["scalar"]) == -12345


def test_roundtrip_namedtuple_and_leaf_api():
    from typing import NamedTuple

    class R(NamedTuple):
        a: object
        b: object

    r = R(jnp.arange(10, dtype=jnp.int32), jnp.ones((2, 4), jnp.uint8))
    out = fetch_packed(r)
    assert isinstance(out, R)
    np.testing.assert_array_equal(np.asarray(out.a), np.arange(10))
    assert out.a.shape == (10,)
    assert out.a.dtype == np.int32
    np.testing.assert_array_equal(out.b[1], np.ones(4, np.uint8))


def _cli_wire_ab(tmp_path, extra_args=()):
    """Run the CLI with NGM_WIRE=1 and =0; return both outputs (sans @PG)."""
    from nextgenmap_tpu.io.encode import decode_seq
    from nextgenmap_tpu.io.fasta import write_fasta
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq

    g = random_genome(120_000, seed=5)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(str(tmp_path / "r.fq"),
                simulate_reads(g, 500, read_len=100, seed=6))
    outs = {}
    for wire in ("1", "0"):
        env = dict(os.environ, NGM_WIRE=wire,
                   PYTHONPATH=os.path.dirname(os.path.dirname(__file__))
                   + os.pathsep + os.environ.get("PYTHONPATH", ""))
        out = tmp_path / f"out{wire}.sam"
        subprocess.run(
            [sys.executable, "-m", "nextgenmap_tpu.cli", "map",
             "-r", str(tmp_path / "ref.fa"), "-q", str(tmp_path / "r.fq"),
             "-o", str(out), "--batch-size", "256", *extra_args],
            check=True, env=env, capture_output=True,
        )
        lines = [l for l in open(out) if not l.startswith("@PG")]
        outs[wire] = "".join(lines)
    return outs


@pytest.mark.slow
def test_cli_wire_vs_per_leaf_byte_identical(tmp_path):
    """The wire fetch must not change a single output byte."""
    outs = _cli_wire_ab(tmp_path)
    assert outs["1"] == outs["0"]


@pytest.mark.slow
def test_cli_wire_byte_identical_dp_mesh(tmp_path):
    """Wire fetch now packs mesh results too (VERDICT r4 weak #4): the dp
    shard_map path must stay byte-identical with packing on."""
    outs = _cli_wire_ab(tmp_path, ("--devices", "4"))
    assert outs["1"] == outs["0"]


@pytest.mark.slow
def test_cli_wire_byte_identical_dp_ish_mesh(tmp_path):
    """(dp, ish) composed mesh (--devices 4 --index-shards 2) with packing."""
    outs = _cli_wire_ab(
        tmp_path, ("--devices", "4", "--index-shards", "2", "-k", "13"))
    assert outs["1"] == outs["0"]
