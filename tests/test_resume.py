"""Checkpoint/resume + --qry-start/--qry-count (SURVEY.md §5.4, §2.1)."""

import json

import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq

N = 150
B = 32


@pytest.fixture(scope="module")
def rdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    g = random_genome(30_000, seed=14)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(str(d / "reads.fq"),
                simulate_reads(g, N, read_len=100, snp_rate=0.02, seed=15))
    return d


def _map(d, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
        "-o", str(d / out), "-k", "11", "--batch-size", str(B),
        "--no-progress", *extra,
    ])
    assert rc == 0
    return [l for l in (d / out).read_text().splitlines() if not l.startswith("@")]


def test_qry_window(rdir):
    full = _map(rdir, "full.sam")
    part = _map(rdir, "win.sam", ("--qry-start", "50", "--qry-count", "40"))
    assert len(part) == 40
    assert part == full[50:90]


def test_resume_completes_interrupted_run(rdir):
    full = _map(rdir, "full2.sam")
    # phase 1: map only the first 64 reads (stands in for an interrupted run)
    _map(rdir, "resumed.sam", ("--qry-count", "64"))
    prog = rdir / "resumed.sam.ngmt-progress.json"
    p = json.loads(prog.read_text())
    assert p["reads_emitted"] == 64
    # mark the checkpoint incomplete, as a killed run would have left it
    p["complete"] = False
    prog.write_text(json.dumps(p))
    # plant a marker: if resume truly APPENDS, it survives; a fresh
    # (non-resumed) rerun would overwrite the file and lose it
    with open(rdir / "resumed.sam", "a") as f:
        f.write("@CO\tresume-marker\n")
    # phase 2: resume — must append exactly the remaining reads
    resumed = _map(rdir, "resumed.sam", ("--resume",))
    assert "@CO\tresume-marker" in (rdir / "resumed.sam").read_text()
    assert len(resumed) == N
    assert resumed == full
    assert json.loads(prog.read_text())["complete"] is True


def test_resume_ignores_mismatched_config(rdir):
    _map(rdir, "cfg.sam", ("--qry-count", "64"))
    prog = rdir / "cfg.sam.ngmt-progress.json"
    p = json.loads(prog.read_text())
    p["complete"] = False
    prog.write_text(json.dumps(p))
    # different sensitivity => config hash differs => fresh run, full output
    out = _map(rdir, "cfg.sam", ("--resume", "-s", "0.4"))
    assert len(out) == N
