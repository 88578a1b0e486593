"""--bam output: BGZF/BAM encoding round-trips to the SAM records
(SURVEY.md §2 component 13; no htslib needed)."""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.bam import read_bam
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq


@pytest.fixture(scope="module")
def bam_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bam")
    g = random_genome(30_000, seed=4)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(
        str(d / "reads.fq"),
        simulate_reads(g, 60, read_len=100, snp_rate=0.02, seed=5),
    )
    for ext in ("sam", "bam"):
        args = [
            "map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
            "-o", str(d / f"out.{ext}"), "-k", "11", "--batch-size", "32",
            "--no-progress",
        ]
        if ext == "bam":
            args.append("--bam")
        assert main(args) == 0
    return d


def test_bam_matches_sam(bam_dir):
    sam_recs = [
        line.split("\t")
        for line in (bam_dir / "out.sam").read_text().splitlines()
        if not line.startswith("@")
    ]
    header, refs, bam_recs = read_bam(str(bam_dir / "out.bam"))
    assert refs == [("chr1", 30_000)]
    assert "@SQ\tSN:chr1\tLN:30000" in header
    assert len(bam_recs) == len(sam_recs)
    for s, b in zip(sam_recs, bam_recs):
        assert s[:11] == b[:11], f"record mismatch:\nSAM {s}\nBAM {b}"


def test_bgzf_is_gzip_compatible(bam_dir):
    import gzip

    raw = gzip.decompress((bam_dir / "out.bam").read_bytes())
    assert raw[:4] == b"BAM\x01"
