"""Native C++ IO (parser + SAM formatter) is byte-identical to the Python
paths (SURVEY.md §2 components 11/14/25 — the reference's host runtime is
native; ours is too, with Python as the portable fallback)."""

import numpy as np
import pytest

from nextgenmap_tpu import native
from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq


@pytest.fixture(scope="module")
def ndir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    g = random_genome(40_000, seed=8)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    reads = simulate_reads(g, 120, read_len=100, snp_rate=0.03,
                           indel_rate=0.003, seed=9)
    # vary the lengths so clip paths and short-read rc paths are exercised
    for i, r in enumerate(reads):
        if i % 7 == 0:
            r.codes = r.codes[: 60 + i % 30]
    write_fastq(str(d / "reads.fq"), reads)
    return d


def _map(d, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
        "-o", str(d / out), "-k", "11", "--batch-size", "32",
        "--no-progress", "--rg-id", "rg1", *extra,
    ])
    assert rc == 0
    return [
        l for l in (d / out).read_text().splitlines()
        if not l.startswith("@PG")
    ]


def _with_python_paths(fn):
    """Run fn with the native lib disabled (pure-Python fallback)."""
    old = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        return fn()
    finally:
        native._LIB, native._TRIED = old


def test_native_available():
    assert native.lib() is not None, "g++ toolchain expected in this image"


def test_native_output_matches_python(ndir):
    nat = _map(ndir, "nat.sam")
    pyo = _with_python_paths(lambda: _map(ndir, "py.sam"))
    assert nat == pyo


def test_native_hard_clip_matches(ndir):
    nat = _map(ndir, "nat_hc.sam", ("--hard-clip",))
    pyo = _with_python_paths(lambda: _map(ndir, "py_hc.sam", ("--hard-clip",)))
    assert nat == pyo


def test_native_parser_gz_and_fasta(ndir, tmp_path):
    import gzip
    import shutil

    gz = tmp_path / "reads.fq.gz"
    with open(ndir / "reads.fq", "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    from nextgenmap_tpu.io.fastq import batch_single

    a = list(batch_single(str(ndir / "reads.fq"), 32, 100))
    b = list(batch_single(str(gz), 32, 100))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.names == y.names
        assert np.array_equal(x.codes, y.codes)
        assert x.quals == y.quals
