"""Multi-host mapping tests (SURVEY.md §4 item 6, §5.8).

Two real processes on localhost, each mapping its round-robin batch shard to
a .part file; process 0 merges.  Asserts the merged SAM is record-identical
to a single-process run (DESIGN.md rule 14: shard count never changes
output) and that the summed per-part stats match.
"""

import json
import os
import subprocess
import sys

import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dist_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist")
    g = random_genome(40_000, seed=21)
    write_fasta(str(d / "ref.fa"), [("chrD", decode_seq(g))])
    # 5 batches of 64 + a partial: odd/even split exercises both owners
    write_fastq(str(d / "reads.fq"),
                simulate_reads(g, 350, read_len=100, snp_rate=0.02, seed=22))
    rc = main(["map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
               "-o", str(d / "single.sam"), "-k", "11", "--batch-size", "64",
               "--no-progress", "--skip-save"])
    assert rc == 0
    return d


def _body(path):
    """(non-@PG header lines, record lines) — @PG embeds the differing argv."""
    hdr, recs = [], []
    for line in open(path):
        (hdr if line.startswith("@") else recs).append(line)
    return [h for h in hdr if not h.startswith("@PG")], recs


def _spawn(d, procid, nprocs, out="dist.sam", extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.Popen(
        [sys.executable, "-m", "nextgenmap_tpu.cli", "map",
         "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
         "-o", str(d / out), "-k", "11", "--batch-size", "64",
         "--no-progress", "--skip-save",
         "--dist-nprocs", str(nprocs), "--dist-procid", str(procid), *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def test_two_process_shard_and_merge(dist_dir):
    d = dist_dir
    procs = [_spawn(d, i, 2) for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    hdr_s, recs_s = _body(d / "single.sam")
    hdr_d, recs_d = _body(d / "dist.sam")
    assert hdr_d == hdr_s
    assert recs_d == recs_s          # byte-identical records, input order
    # parts are cleaned up after a successful merge
    assert not os.path.exists(str(d / "dist.sam") + ".part0-of-2")


def test_two_process_with_jax_distributed(dist_dir):
    """Same run but through jax.distributed.initialize on localhost — the
    global-runtime path a pod slice uses (§5.8).  Output must still match
    the single-process run."""
    import socket

    d = dist_dir
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = ("--dist-coordinator", f"127.0.0.1:{port}")
    procs = [_spawn(d, i, 2, out="distg.sam", extra=coord) for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    assert "jax.distributed up" in outs[0] + outs[1]
    _, recs_s = _body(d / "single.sam")
    _, recs_g = _body(d / "distg.sam")
    assert recs_g == recs_s


def test_part_and_manifest_shapes(dist_dir):
    """--no-merge leaves parts; manifests carry consistent counts."""
    d = dist_dir
    # only proc 1 runs (proc 0 never shows up) — its shard must be complete
    # and self-describing on its own
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, "-m", "nextgenmap_tpu.cli", "map",
         "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
         "-o", str(d / "nm.sam"), "-k", "11", "--batch-size", "64",
         "--no-progress", "--skip-save", "--no-merge",
         "--dist-nprocs", "2", "--dist-procid", "1"],
        env=env, capture_output=True, timeout=600,
    )
    assert p.returncode == 0, p.stderr.decode() + p.stdout.decode()
    part = str(d / "nm.sam") + ".part1-of-2"
    man = json.load(open(part + ".manifest.json"))
    assert man["complete"] and man["nprocs"] == 2
    # proc 1 owns batches 1,3,5 of ceil(350/64)=6 -> 64+64+30=158 reads
    assert man["stats"]["reads_in"] == 158
    n_recs = sum(1 for line in open(part) if not line.startswith("@"))
    assert sum(man["batch_lines"]) == n_recs >= 158


def test_dist_bam_output(dist_dir):
    """--bam under --dist-nprocs: parts stay SAM text, process 0's merge
    encodes BAM (VERDICT r1 weak #6)."""
    d = dist_dir
    procs = [_spawn(d, i, 2, out="dist.bam", extra=("--bam",)) for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    from nextgenmap_tpu.io.bam import read_bam

    _, _, recs = read_bam(str(d / "dist.bam"))
    _, recs_s = _body(d / "single.sam")
    sam_fields = [l.rstrip("\n").split("\t") for l in recs_s]
    assert len(recs) == len(sam_fields)
    for got, want in zip(recs, sam_fields):
        assert got[:9] == want[:9]
        assert got[9] == want[9]


def test_dist_resume_after_kill(dist_dir):
    """Per-part resume (VERDICT r1 item 6): one process dies mid-run, is
    restarted with --resume, and the merged output is still byte-identical
    to the single-process run."""
    d = dist_dir
    out = "distr.sam"
    # proc 1 completes; proc 0 "dies" after 3 global batches (2 of its own)
    p1 = _spawn(d, 1, 2, out=out, extra=("--no-merge",))
    p0a = _spawn(d, 0, 2, out=out, extra=("--no-merge", "--qry-count", "192"))
    for p in (p1, p0a):
        o = p.communicate(timeout=600)[0].decode()
        assert p.returncode == 0, o
    part0 = str(d / out) + ".part0-of-2"
    prog = part0 + ".ngmt-progress.json"
    doc = json.load(open(prog))
    assert doc["reads_emitted"] == 128 and len(doc["batch_lines"]) == 2
    doc["complete"] = False          # as a kill would have left it
    json.dump(doc, open(prog, "w"))
    phase1 = open(part0, "rb").read()
    with open(part0, "ab") as f:     # partial in-flight record
        f.write(b"GARBAGE\tpartial")
    # restart proc 0 with --resume over the FULL input; it merges at the end
    p0b = _spawn(d, 0, 2, out=out, extra=("--resume",))
    o = p0b.communicate(timeout=600)[0].decode()
    assert p0b.returncode == 0, o
    assert "resuming after 128 already-emitted reads" in o
    _, recs_s = _body(d / "single.sam")
    _, recs_r = _body(d / out)
    assert recs_r == recs_s
