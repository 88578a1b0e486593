"""-n/--topn multiple alignments + --strata (SURVEY.md §2.1)."""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import SimRead, random_genome, write_fastq

L = 80


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """Genome with an exact duplicated segment + reads from it."""
    d = tmp_path_factory.mktemp("topn")
    rng = np.random.default_rng(9)
    g = random_genome(40_000, seed=33)
    seg = g[5_000 : 5_000 + 600].copy()
    g[20_000 : 20_000 + 600] = seg           # exact duplicate at 20k
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    reads = []
    for i in range(8):
        off = 5_000 + 40 * i
        reads.append(SimRead(
            name=f"dup_{i}_{off}", codes=g[off : off + L].copy(),
            chrom=0, pos=off, strand=0, n_snps=0, n_indels=0,
        ))
    # one unique-locus read as control
    reads.append(SimRead(
        name="uniq_0_30000", codes=g[30_000 : 30_000 + L].copy(),
        chrom=0, pos=30_000, strand=0, n_snps=0, n_indels=0,
    ))
    write_fastq(str(d / "reads.fq"), reads)
    return d


def _records(d, out, extra=()):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
        "-o", str(d / out), "-k", "11", "--batch-size", "16",
        "--no-progress", *extra,
    ])
    assert rc == 0
    recs = {}
    for line in (d / out).read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        recs.setdefault(f[0], []).append(f)
    return recs


def test_topn_reports_both_loci(dup_dir):
    recs = _records(dup_dir, "n2.sam", ("-n", "2"))
    for name, rows in recs.items():
        if name.startswith("uniq"):
            # unique locus: the duplicate suppression must not fabricate one
            assert len(rows) == 1
            continue
        assert len(rows) == 2, f"{name}: expected primary+secondary"
        flags = sorted(int(r[1]) & 0x100 for r in rows)
        assert flags == [0, 0x100]
        poss = sorted(int(r[3]) - 1 for r in rows)
        true_off = int(name.split("_")[2])
        assert abs(poss[0] - true_off) <= 5
        assert abs(poss[1] - (true_off + 15_000)) <= 5  # duplicate locus

    # equal-score duplicates => ambiguous => primary MAPQ must be 0
    for name, rows in recs.items():
        if name.startswith("dup"):
            primary = next(r for r in rows if not int(r[1]) & 0x100)
            assert int(primary[4]) == 0


def test_default_n1_single_record(dup_dir):
    recs = _records(dup_dir, "n1.sam")
    assert all(len(rows) == 1 for rows in recs.values())


def test_topn_sharded_identical(dup_dir):
    """-n x --index-shards (VERDICT round-2 directive 7): per-shard rank
    lists merged by merge_sharded_topn are record-identical to unsharded
    topn — the duplicated segment spans both shard cores, so the merge
    genuinely interleaves loci owned by different shards."""
    d = dup_dir
    strip = lambda out: [
        l for l in (d / out).read_text().splitlines()
        if not l.startswith("@PG")
    ]
    _records(d, "n2_base.sam", ("-n", "2"))
    _records(d, "n2_s2.sam", ("-n", "2", "--index-shards", "2"))
    assert strip("n2_base.sam") == strip("n2_s2.sam")
    _records(d, "n2_s3.sam", ("-n", "2", "--index-shards", "3"))
    assert strip("n2_base.sam") == strip("n2_s3.sam")


def test_strata_keeps_only_top_stratum(dup_dir):
    # exact duplicates tie => strata keeps both; a read with SNPs vs the
    # second locus would drop it, but here both are in the top stratum
    recs = _records(dup_dir, "strata.sam", ("-n", "4", "--strata"))
    for name, rows in recs.items():
        if name.startswith("dup"):
            assert len(rows) == 2
            scores = {int(r[1]) & 0x100: r for r in rows}
            assert set(scores) == {0, 0x100}
