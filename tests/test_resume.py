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
    phase1 = (rdir / "resumed.sam").read_bytes()
    assert p["out_bytes"] == len(phase1)
    # mark the checkpoint incomplete, as a killed run would have left it,
    # and simulate a partial record the kill left past the checkpoint
    p["complete"] = False
    prog.write_text(json.dumps(p))
    with open(rdir / "resumed.sam", "ab") as f:
        f.write(b"GARBAGE\ttruncated-in-flight-rec")
    # phase 2: resume — drops the partial tail, appends the remaining reads
    resumed = _map(rdir, "resumed.sam", ("--resume",))
    final = (rdir / "resumed.sam").read_bytes()
    # appended after the checkpoint (phase-1 bytes intact, incl. its @PG CL
    # line, which a fresh rerun would have replaced), garbage gone
    assert final.startswith(phase1)
    assert b"GARBAGE" not in final
    assert len(resumed) == N
    assert resumed == full
    assert json.loads(prog.read_text())["complete"] is True


def test_sigkill_mid_run_then_resume(rdir):
    """Fault injection (SURVEY.md §5.3): SIGKILL the mapper mid-run, resume,
    and require the final output to equal an uninterrupted run's records."""
    import os
    import signal
    import subprocess
    import sys
    import time

    full = _map(rdir, "full3.sam")
    out = rdir / "killed.sam"
    prog = rdir / "killed.sam.ngmt-progress.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "nextgenmap_tpu.cli", "map",
         "-r", str(rdir / "ref.fa"), "-q", str(rdir / "reads.fq"),
         "-o", str(out), "-k", "11", "--batch-size", str(B),
         "--no-progress", "--skip-save"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # kill (the exact child PID, never a pattern) once >= 1 batch checkpointed
    deadline = time.time() + 300
    emitted = 0
    while time.time() < deadline:
        if prog.exists():
            try:
                q = json.loads(prog.read_text())
            except ValueError:
                q = {}
            emitted = q.get("reads_emitted", 0)
            if 0 < emitted < N and not q.get("complete"):
                break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    if proc.poll() is None and 0 < emitted < N:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        assert proc.returncode != 0
        resumed = _map(rdir, "killed.sam", ("--resume",))
        assert len(resumed) == N
        assert resumed == full
    else:
        # the run finished before a kill window opened (fast machine) —
        # nothing to resume; just sanity-check the complete output
        proc.wait(timeout=600)
        recs = [l for l in out.read_text().splitlines()
                if not l.startswith("@")]
        assert len(recs) == N


def test_resume_ignores_mismatched_config(rdir):
    _map(rdir, "cfg.sam", ("--qry-count", "64"))
    prog = rdir / "cfg.sam.ngmt-progress.json"
    p = json.loads(prog.read_text())
    p["complete"] = False
    prog.write_text(json.dumps(p))
    # different sensitivity => config hash differs => fresh run, full output
    out = _map(rdir, "cfg.sam", ("--resume", "-s", "0.4"))
    assert len(out) == N
