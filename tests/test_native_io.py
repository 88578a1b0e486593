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


def test_native_silent_clip_matches(ndir):
    nat = _map(ndir, "nat_sc.sam", ("--silent-clip",))
    pyo = _with_python_paths(lambda: _map(ndir, "py_sc.sam", ("--silent-clip",)))
    assert nat == pyo


def test_native_unmapped_rows_match(ndir, tmp_path):
    """Batches with unmapped reads render through the same single native
    call (no Python interleave) — byte-identical to the Python writer."""
    import numpy as np

    rng = np.random.default_rng(12)
    with open(ndir / "reads.fq") as f, open(tmp_path / "mix.fq", "w") as o:
        o.write(f.read())
        for i in range(17):
            alien = decode_seq(rng.integers(0, 4, 100).astype(np.uint8))
            o.write(f"@alien_{i}_0_0\n{alien}\n+\n{'I' * 100}\n")
    d = ndir

    def run(out, extra=()):
        rc = main([
            "map", "-r", str(d / "ref.fa"), "-q", str(tmp_path / "mix.fq"),
            "-o", str(tmp_path / out), "-k", "11", "--batch-size", "32",
            "--no-progress", "--rg-id", "rg1", *extra,
        ])
        assert rc == 0
        return [l for l in (tmp_path / out).read_text().splitlines()
                if not l.startswith("@PG")]

    nat = run("nat.sam")
    pyo = _with_python_paths(lambda: run("py.sam"))
    assert nat == pyo
    assert any(int(l.split("\t")[1]) & 4 for l in nat if not l.startswith("@"))
    nat_nu = run("nat_nu.sam", ("--no-unal",))
    pyo_nu = _with_python_paths(lambda: run("py_nu.sam", ("--no-unal",)))
    assert nat_nu == pyo_nu


def test_native_paired_matches(ndir, tmp_path):
    """Paired emission (flags, RNEXT/PNEXT/TLEN, unmapped-mate coordinate
    inheritance) via the one-call native path == the Python writer."""
    import numpy as np

    from nextgenmap_tpu.io.simulate import simulate_pairs

    g = random_genome(40_000, seed=8)  # same genome as the ndir fixture
    pairs = simulate_pairs(g, 70, read_len=100, insert_mean=300, insert_sd=40,
                           snp_rate=0.03, seed=13)
    rng = np.random.default_rng(14)
    r1s, r2s = [p[0] for p in pairs], [p[1] for p in pairs]
    # make some mates unmappable so the unmapped-mate path is exercised
    for i in (3, 11, 40):
        r2s[i].codes = rng.integers(0, 4, 100).astype(np.uint8)
    write_fastq(str(tmp_path / "r1.fq"), r1s)
    write_fastq(str(tmp_path / "r2.fq"), r2s)

    def run(out):
        rc = main([
            "map", "-r", str(ndir / "ref.fa"),
            "-1", str(tmp_path / "r1.fq"), "-2", str(tmp_path / "r2.fq"),
            "-o", str(tmp_path / out), "-k", "11", "--batch-size", "32",
            "--no-progress", "--rg-id", "rg1",
        ])
        assert rc == 0
        return [l for l in (tmp_path / out).read_text().splitlines()
                if not l.startswith("@PG")]

    nat = run("nat_pe.sam")
    pyo = _with_python_paths(lambda: run("py_pe.sam"))
    assert nat == pyo
    flags = [int(l.split("\t")[1]) for l in nat if not l.startswith("@")]
    assert any(f & 2 for f in flags)          # proper pairs
    assert any(f & 8 for f in flags)          # mate-unmapped
    assert any(f & 4 for f in flags)          # unmapped rows


def test_native_topn_matches(tmp_path):
    """-n/--topn secondary-record emission via the native path == Python."""
    import numpy as np

    g = random_genome(6000, seed=15)
    dup = np.concatenate([g, g[:3000], g[:2000]])  # repeats => multi-hits
    write_fasta(str(tmp_path / "dup.fa"), [("chr1", decode_seq(dup))])
    reads = simulate_reads(g[:3000], 60, read_len=100, snp_rate=0.01, seed=16)
    write_fastq(str(tmp_path / "r.fq"), reads)

    def run(out, extra=()):
        rc = main([
            "map", "-r", str(tmp_path / "dup.fa"), "-q", str(tmp_path / "r.fq"),
            "-o", str(tmp_path / out), "-k", "11", "--batch-size", "32",
            "--no-progress", "--skip-save", "-n", "3", *extra,
        ])
        assert rc == 0
        return [l for l in (tmp_path / out).read_text().splitlines()
                if not l.startswith("@PG")]

    nat = run("nat_tn.sam")
    pyo = _with_python_paths(lambda: run("py_tn.sam"))
    assert nat == pyo
    flags = [int(l.split("\t")[1]) for l in nat if not l.startswith("@")]
    assert any(f & 0x100 for f in flags)   # secondaries present
    nat_s = run("nat_ts.sam", ("--strata",))
    pyo_s = _with_python_paths(lambda: run("py_ts.sam", ("--strata",)))
    assert nat_s == pyo_s
