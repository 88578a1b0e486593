"""SLAM-seq mode (--slam-seq, SURVEY.md §2 component 23): T->C-tolerant
scoring so 4sU-labeled conversions are not penalized."""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import CODE_C, CODE_T, decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import SimRead, random_genome, write_fastq

L = 100
N = 24


@pytest.fixture(scope="module")
def slam_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("slam")
    rng = np.random.default_rng(6)
    g = random_genome(40_000, seed=17)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    reads = []
    for i in range(N):
        origin = int(rng.integers(0, g.shape[0] - L))
        seq = g[origin : origin + L].copy()
        ts = np.nonzero(seq == CODE_T)[0]
        conv = ts[rng.random(ts.shape[0]) < 0.3]  # 30% of Ts read as C
        seq[conv] = CODE_C
        reads.append(SimRead(
            name=f"slam_{i}_{origin}", codes=seq,
            chrom=0, pos=origin, strand=0, n_snps=0, n_indels=0,
        ))
    write_fastq(str(d / "reads.fq"), reads)
    return d


def _scores(d, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
        "-o", str(d / out), "-k", "11", "--batch-size", "32",
        "--no-progress", *extra,
    ])
    assert rc == 0
    res = {}
    for line in (d / out).read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        score = next(
            (int(t.split(":")[2]) for t in f[11:] if t.startswith("AS:i:")), 0
        )
        res[f[0]] = (int(f[1]), int(f[3]) - 1, score)
    return res


def test_slam_scores_tolerate_conversions(slam_dir):
    base = _scores(slam_dir, "nos.sam")
    slam = _scores(slam_dir, "slam.sam", ("--slam-seq", "2"))
    better = 0
    for name in base:
        origin = int(name.split("_")[2])
        flag, pos, s2 = slam[name]
        assert not flag & 4
        assert abs(pos - origin) <= 5  # still maps to truth
        if s2 > base[name][2]:
            better += 1
    # with ~30% of Ts converted, slam scoring must beat normal scoring
    assert better >= int(0.9 * N)
