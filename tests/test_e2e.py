"""End-to-end single-end pipeline tests (SURVEY.md §4 items 1, 6).

Golden-style validation without a runnable reference binary (BASELINE.md
fallback): simulated-truth accuracy + internal SAM consistency (CIGAR/MD/NM
reconstruct the read from the reference) + determinism/batch invariance.
"""

import re

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq, encode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq

GENOME_SIZE = 50_000
N_READS = 120


@pytest.fixture(scope="session")
def e2e_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    g = random_genome(GENOME_SIZE, seed=11)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    reads = simulate_reads(g, N_READS, read_len=100, snp_rate=0.02,
                           indel_rate=0.002, seed=5)
    write_fastq(str(d / "reads.fq"), reads)
    hi = simulate_reads(g, N_READS, read_len=100, snp_rate=0.10,
                        indel_rate=0.01, seed=6, prefix="hidiv")
    write_fastq(str(d / "hidiv.fq"), hi)
    return d


def run_map(d, fq, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / fq), "-o", str(d / out),
        "-k", "11", "--batch-size", "64", "--no-progress", *extra,
    ])
    assert rc == 0
    return (d / out).read_text()


def parse_records(sam_text):
    recs = []
    for line in sam_text.splitlines():
        if line.startswith("@"):
            continue
        recs.append(line.split("\t"))
    return recs


def accuracy(recs, tol=5):
    mapped = correct = 0
    for f in recs:
        flag = int(f[1])
        if flag & 4:
            continue
        mapped += 1
        _, _, pos, strand = f[0].rsplit("_", 3)
        if (1 if flag & 16 else 0) == int(strand) and abs(int(f[3]) - 1 - int(pos)) <= tol:
            correct += 1
    return mapped, correct


def test_low_divergence_accuracy(e2e_dir):
    recs = parse_records(run_map(e2e_dir, "reads.fq", "out.sam"))
    assert len(recs) == N_READS
    mapped, correct = accuracy(recs)
    assert mapped >= 0.98 * N_READS
    assert correct >= 0.98 * mapped


def test_high_divergence_sensitivity(e2e_dir):
    """The reference's defining property: keep mapping at ~10% divergence."""
    recs = parse_records(run_map(e2e_dir, "hidiv.fq", "hidiv.sam",
                                 extra=["-s", "0.3"]))
    mapped, correct = accuracy(recs, tol=8)
    assert mapped >= 0.90 * N_READS
    assert correct >= 0.95 * mapped


def test_sam_internal_consistency(e2e_dir):
    """CIGAR+POS+SEQ must reconstruct against the reference genome, and NM
    must equal observed substitutions+indels (CIGAR-exactness check)."""
    from nextgenmap_tpu.index.genome import Genome

    genome = Genome.open(str(e2e_dir / "ref.fa"))
    sam = run_map(e2e_dir, "reads.fq", "out2.sam")
    n_checked = 0
    for f in parse_records(sam):
        flag = int(f[1])
        if flag & 4:
            continue
        pos = int(f[3]) - 1
        cigar, seq = f[5], f[9]
        nm = int(next(x.split(":")[2] for x in f[11:] if x.startswith("NM:i")))
        qi = ri = 0
        subs = indels = 0
        for num, op in re.findall(r"(\d+)([MIDSH])", cigar):
            n = int(num)
            if op == "M":
                ref_part = genome.decode(pos + ri, n)
                q_part = seq[qi : qi + n]
                subs += sum(1 for a, b in zip(q_part, ref_part) if a != b)
                qi += n
                ri += n
            elif op == "I":
                indels += n
                qi += n
            elif op == "D":
                indels += n
                ri += n
            elif op in "SH":
                qi += n if op == "S" else 0
        assert qi == len(seq), f"CIGAR does not consume SEQ: {f[0]} {cigar}"
        assert nm == subs + indels, f"NM mismatch for {f[0]}: {nm} vs {subs + indels}"
        n_checked += 1
    assert n_checked > 100


def test_determinism_and_batch_invariance(e2e_dir):
    a = run_map(e2e_dir, "reads.fq", "a.sam")
    b = run_map(e2e_dir, "reads.fq", "b.sam")
    strip = lambda s: "\n".join(l for l in s.splitlines() if not l.startswith("@PG"))
    assert strip(a) == strip(b)
    c = run_map(e2e_dir, "reads.fq", "c.sam", extra=["--batch-size", "32"])
    assert strip(a) == strip(c)


def test_unmapped_reads_emitted(e2e_dir):
    # alien reads must appear as flag-4 records (and disappear with --no-unal)
    rng = np.random.default_rng(9)
    alien = decode_seq(rng.integers(0, 4, 100).astype(np.uint8))
    fq = e2e_dir / "alien.fq"
    fq.write_text(f"@alien_0_0_0\n{alien}\n+\n{'I' * 100}\n")
    sam = run_map(e2e_dir, "alien.fq", "alien.sam")
    recs = parse_records(sam)
    assert len(recs) == 1 and int(recs[0][1]) & 4
    sam2 = run_map(e2e_dir, "alien.fq", "alien2.sam", extra=["--no-unal"])
    assert len(parse_records(sam2)) == 0


def test_mapq_zero_for_ambiguous(e2e_dir, tmp_path):
    # duplicate locus => read maps equally well to two places => MAPQ 0
    g = random_genome(6000, seed=21)
    dup = np.concatenate([g, g[:2000]])
    d = tmp_path
    write_fasta(str(d / "dup.fa"), [("chr1", decode_seq(dup))])
    read = decode_seq(g[500:600])
    (d / "r.fq").write_text(f"@dupread_0_500_0\n{read}\n+\n{'I' * 100}\n")
    rc = main([
        "map", "-r", str(d / "dup.fa"), "-q", str(d / "r.fq"),
        "-o", str(d / "o.sam"), "-k", "11", "--batch-size", "64", "--no-progress",
    ])
    assert rc == 0
    recs = parse_records((d / "o.sam").read_text())
    assert len(recs) == 1
    assert int(recs[0][4]) == 0  # ambiguous => MAPQ 0
    # DESIGN rule 11: ties resolve to the smaller position
    assert int(recs[0][3]) - 1 == 500


def test_multi_device_dp_identical(e2e_dir):
    """--devices N (dp shard_map over the CPU mesh) must be record-identical
    to the single-device run (DESIGN.md rule 14/15)."""
    one = run_map(e2e_dir, "reads.fq", "dp1.sam")
    four = run_map(e2e_dir, "reads.fq", "dp4.sam", ("--devices", "4"))
    strip = lambda t: [l for l in t.splitlines() if not l.startswith("@PG")]
    assert strip(one) == strip(four)


def test_threads_flag_wires_async_emitter(e2e_dir, monkeypatch):
    """-t >= 2 must engage concurrent emission (VERDICT r1: no inert flags)
    and produce byte-identical output.  -t 2 = dedicated emitter thread;
    -t >= 3 = parallel render pool with ordered commit."""
    import nextgenmap_tpu.pipeline.runner as R

    created = []
    pools = []
    orig = R._Emitter
    orig_pool = R._PoolEmitter

    class Spy(orig):
        def __init__(self, async_):
            created.append(async_)
            super().__init__(async_)

    class PoolSpy(orig_pool):
        def __init__(self, workers, render, commit):
            pools.append(workers)
            super().__init__(workers, render, commit)

    monkeypatch.setattr(R, "_Emitter", Spy)
    monkeypatch.setattr(R, "_PoolEmitter", PoolSpy)
    one = run_map(e2e_dir, "reads.fq", "thr1.sam")
    two = run_map(e2e_dir, "reads.fq", "thr2.sam", ("-t", "2"))
    four = run_map(e2e_dir, "reads.fq", "thr4.sam", ("-t", "4"))
    strip = lambda t: [l for l in t.splitlines() if not l.startswith("@PG")]
    assert strip(one) == strip(two)
    assert strip(one) == strip(four)
    assert created == [False, True]   # -t1 sync, -t2 async thread
    assert pools == [3]               # -t4 = pool of 3 render workers
