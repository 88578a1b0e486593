"""SAM-format read input (SURVEY.md §2 component 14's BAM/SAM input path)."""

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.fastq import iter_reads
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq


def _fastq_to_sam(fq_path, sam_path, revcomp_every=3):
    """Make an unaligned-style SAM from a FASTQ; every Nth record is stored
    reverse-complemented with FLAG 0x10 to test orientation restoration."""
    import numpy as np

    from nextgenmap_tpu.io.encode import encode_seq, revcomp_codes

    recs = list(iter_reads(fq_path))
    with open(sam_path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:chrX\tLN:99999\n")
        for i, r in enumerate(recs):
            codes, qual, flag = r.codes, r.qual or b"I" * len(r.codes), 4
            if i % revcomp_every == 0:
                codes = revcomp_codes(codes)
                qual = qual[::-1]
                flag = 16
            f.write(
                f"{r.name}\t{flag}\tchrX\t1\t0\t*\t*\t0\t0\t"
                f"{decode_seq(codes)}\t{qual.decode('ascii')}\n"
            )
    return recs


def test_sam_input_round_trip(tmp_path):
    g = random_genome(20_000, seed=91)
    fq = tmp_path / "r.fq"
    write_fastq(str(fq), simulate_reads(g, 50, read_len=80, seed=92))
    sam_in = tmp_path / "r.sam"
    orig = _fastq_to_sam(str(fq), str(sam_in))
    got = list(iter_reads(str(sam_in)))
    assert len(got) == len(orig)
    for a, b in zip(orig, got):
        assert a.name == b.name
        assert (a.codes == b.codes).all()   # orientation restored
        assert (a.qual or b"I" * len(a.codes)) == b.qual


def test_map_from_sam_input(tmp_path):
    g = random_genome(30_000, seed=93)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), simulate_reads(g, 120, read_len=100,
                                        snp_rate=0.02, seed=94))
    _fastq_to_sam(str(fq), str(tmp_path / "reads.sam"))
    for src, out in (("reads.fq", "a.sam"), ("reads.sam", "b.sam")):
        rc = main(["map", "-r", str(tmp_path / "ref.fa"),
                   "-q", str(tmp_path / src), "-o", str(tmp_path / out),
                   "-k", "11", "--batch-size", "64", "--no-progress",
                   "--skip-save"])
        assert rc == 0
    recs = lambda p: [l for l in open(tmp_path / p) if not l.startswith("@")]
    assert recs("a.sam") == recs("b.sam")   # same mapping from either input


def test_gz_and_fasta_read_inputs(tmp_path):
    """.fq.gz and FASTA-format reads map identically to plain FASTQ
    (SURVEY.md §2 component 14: kseq handles all three upstream)."""
    import gzip

    g = random_genome(25_000, seed=95)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    reads = simulate_reads(g, 80, read_len=90, snp_rate=0.02, seed=96)
    write_fastq(str(tmp_path / "r.fq"), reads)
    with open(tmp_path / "r.fq", "rb") as f:
        with gzip.open(tmp_path / "r.fq.gz", "wb") as z:
            z.write(f.read())
    with open(tmp_path / "r.fa", "w") as f:
        for r in reads:
            f.write(f">{r.name}\n{decode_seq(r.codes)}\n")

    outs = {}
    for src in ("r.fq", "r.fq.gz", "r.fa"):
        out = src.replace(".", "_") + ".sam"
        rc = main(["map", "-r", str(tmp_path / "ref.fa"),
                   "-q", str(tmp_path / src), "-o", str(tmp_path / out),
                   "-k", "11", "--batch-size", "64", "--no-progress",
                   "--skip-save"])
        assert rc == 0
        outs[src] = [
            l.split("\t") for l in open(tmp_path / out) if not l.startswith("@")
        ]
    assert len(outs["r.fq"]) == 80
    # gz identical; FASTA identical except QUAL column ('*')
    assert outs["r.fq.gz"] == outs["r.fq"]
    for a, b in zip(outs["r.fa"], outs["r.fq"]):
        assert a[:10] == b[:10]
        assert a[10] == "*"


def test_map_from_bam_input(tmp_path):
    """BAM read input (VERDICT r1 missing #5): records produced by the BAM
    writer map identically to the original FASTQ."""
    g = random_genome(30_000, seed=97)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), simulate_reads(g, 100, read_len=100,
                                        snp_rate=0.02, seed=98))
    base = ["map", "-r", str(tmp_path / "ref.fa"), "-k", "11",
            "--batch-size", "64", "--no-progress", "--skip-save"]
    assert main(base + ["-q", str(fq), "-o", str(tmp_path / "a.sam")]) == 0
    assert main(base + ["-q", str(fq), "-o", str(tmp_path / "in.bam"),
                        "--bam"]) == 0
    assert main(base + ["-q", str(tmp_path / "in.bam"),
                        "-o", str(tmp_path / "b.sam")]) == 0
    recs = lambda p: [l for l in open(tmp_path / p) if not l.startswith("@")]
    assert recs("a.sam") == recs("b.sam")


def test_kmer_min_zero_cmr_fallback(tmp_path):
    """ref:src/CS.cpp CollectResults retry: reads whose best bucket falls
    below --kmer-min still map via the threshold-1 fallback."""
    g = random_genome(30_000, seed=99)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), simulate_reads(g, 60, read_len=100,
                                        snp_rate=0.02, seed=100))
    rc = main(["map", "-r", str(tmp_path / "ref.fa"), "-q", str(fq),
               "-o", str(tmp_path / "o.sam"), "-k", "11", "--batch-size",
               "64", "--no-progress", "--skip-save", "--kmer-min", "50"])
    assert rc == 0
    recs = [l.split("\t") for l in open(tmp_path / "o.sam")
            if not l.startswith("@")]
    mapped = [r for r in recs if not int(r[1]) & 4]
    # a 100 bp read at 2% SNPs has ~45 stride-2 k-mers: every bucket is
    # below 50, so without the fallback nothing would map
    assert len(mapped) >= 0.9 * 60
