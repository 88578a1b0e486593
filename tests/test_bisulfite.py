"""Bisulfite mode (SURVEY.md §2 component 22, BASELINE config 5 style).

Simulates bisulfite-converted reads: original-top (OT) reads carry C->T
conversions and map forward; original-bottom (OB) reads are the reverse
complement of the locus with C->T conversions and map reverse.  Without
--bs-mapping these reads mostly fail (up to ~25% of bases converted);
with it both strands must map to their true positions.
"""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import CODE_C, CODE_T, decode_seq, revcomp_codes
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import SimRead, random_genome, write_fastq

L = 100
N = 40


def _bs_convert(codes: np.ndarray, rng, rate=0.8) -> np.ndarray:
    out = codes.copy()
    cs = np.nonzero(out == CODE_C)[0]
    conv = cs[rng.random(cs.shape[0]) < rate]
    out[conv] = CODE_T
    return out


@pytest.fixture(scope="module")
def bs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bs")
    rng = np.random.default_rng(3)
    g = random_genome(60_000, seed=21)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    reads = []
    truth = []
    for i in range(N):
        origin = int(rng.integers(0, g.shape[0] - L))
        region = g[origin : origin + L]
        if i % 2 == 0:  # OT: sequenced top strand, C->T, maps forward
            seq = _bs_convert(region, rng)
            strand = 0
        else:           # OB: sequenced bottom strand = rc(region), C->T, maps reverse
            seq = _bs_convert(revcomp_codes(region), rng)
            strand = 1
        reads.append(SimRead(
            name=f"bsread_{i}_{origin}_{strand}", codes=seq,
            chrom=0, pos=origin, strand=strand, n_snps=0, n_indels=0,
        ))
        truth.append((origin, strand))
    write_fastq(str(d / "reads.fq"), reads)
    return d, truth


def _run(d, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
        "-o", str(d / out), "-k", "11", "--batch-size", "64",
        "--no-progress", *extra,
    ])
    assert rc == 0
    recs = {}
    for line in (d / out).read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        recs[f[0]] = f
    return recs


def test_bs_mapping_recovers_converted_reads(bs_dir):
    d, truth = bs_dir
    recs = _run(d, "bs.sam", ("--bs-mapping",))
    ok = 0
    for i, (origin, strand) in enumerate(truth):
        f = recs[f"bsread_{i}_{origin}_{strand}"]
        flag = int(f[1])
        if flag & 4:
            continue
        rev = 1 if flag & 16 else 0
        if abs(int(f[3]) - 1 - origin) <= 5 and rev == strand:
            ok += 1
    assert ok >= int(0.9 * N), f"bs mode mapped only {ok}/{N} correctly"


def test_bs_sharded_identical(bs_dir):
    """--bs-mapping x --index-shards (VERDICT round-2 directive 1): the dual
    CT/GA collapsed tables shard by position range and both execution modes
    are record-identical to the unsharded bisulfite run."""
    d, _ = bs_dir
    strip = lambda out: [
        l for l in (d / out).read_text().splitlines()
        if not l.startswith("@PG")
    ]
    _run(d, "bs_base.sam", ("--bs-mapping",))
    _run(d, "bs_seq2.sam", ("--bs-mapping", "--index-shards", "2"))
    assert strip("bs_base.sam") == strip("bs_seq2.sam")
    _run(d, "bs_seq3.sam", ("--bs-mapping", "--index-shards", "3"))
    assert strip("bs_base.sam") == strip("bs_seq3.sam")
    _run(d, "bs_mesh.sam", ("--bs-mapping", "--index-shards", "2",
                            "--devices", "4"))
    assert strip("bs_base.sam") == strip("bs_mesh.sam")


def test_bs_reads_fail_without_bs_mode(bs_dir):
    d, truth = bs_dir
    recs = _run(d, "nobs.sam")
    ok = 0
    for i, (origin, strand) in enumerate(truth):
        f = recs[f"bsread_{i}_{origin}_{strand}"]
        if int(f[1]) & 4:
            continue
        if abs(int(f[3]) - 1 - origin) <= 5:
            ok += 1
    # heavy conversion (~80% of Cs) should cripple normal-mode mapping
    assert ok < int(0.9 * N), f"normal mode unexpectedly mapped {ok}/{N}"
