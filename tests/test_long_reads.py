"""Long-read support (VERDICT r1 missing #3; ref supports reads to ~1000 bp
by widening the corridor).  500/1000 bp reads with indels must map with
correct positions and internally consistent CIGARs; the Pallas score kernel
silently falls back to the XLA path at these band widths."""

import re

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.config import NgmConfig
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq


@pytest.mark.parametrize("read_len", [500, 1000])
def test_long_reads_map(tmp_path, read_len):
    g = random_genome(120_000, seed=read_len)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    reads = simulate_reads(g, 24, read_len=read_len, snp_rate=0.03,
                           indel_rate=0.005, seed=read_len + 1)
    write_fastq(str(tmp_path / "r.fq"), reads)
    rc = main([
        "map", "-r", str(tmp_path / "ref.fa"), "-q", str(tmp_path / "r.fq"),
        "-o", str(tmp_path / "o.sam"), "-k", "13", "--batch-size", "8",
        "--no-progress", "--skip-save",
    ])
    assert rc == 0
    from nextgenmap_tpu.index.genome import Genome

    genome = Genome.open(str(tmp_path / "ref.fa"))
    n = mapped = correct = 0
    for l in open(tmp_path / "o.sam"):
        if l.startswith("@"):
            continue
        f = l.rstrip("\n").split("\t")
        n += 1
        if int(f[1]) & 4:
            continue
        mapped += 1
        _, _, pos, st = f[0].rsplit("_", 3)
        slop = 16  # indel drift over a long read
        if (1 if int(f[1]) & 16 else 0) == int(st) and \
                abs(int(f[3]) - 1 - int(pos)) <= slop:
            correct += 1
        # CIGAR consumes SEQ; NM == observed edits
        p0 = int(f[3]) - 1
        cigar, seq = f[5], f[9]
        nm = int(next(x.split(":")[2] for x in f[11:] if x.startswith("NM:i")))
        qi = ri = subs = ind = 0
        for num, op in re.findall(r"(\d+)([MIDSH])", cigar):
            k = int(num)
            if op == "M":
                refp = genome.decode(p0 + ri, k)
                subs += sum(1 for a, b in zip(seq[qi:qi + k], refp) if a != b)
                qi += k
                ri += k
            elif op == "I":
                ind += k
                qi += k
            elif op == "D":
                ind += k
                ri += k
            elif op == "S":
                qi += k
        assert qi == len(seq), (f[0], cigar)
        assert nm == subs + ind, (f[0], nm, subs + ind)
    assert n == 24
    assert mapped >= 22
    assert correct >= 0.9 * mapped


@pytest.mark.parametrize("paired", [False, True])
def test_staged_step_identical(monkeypatch, paired):
    """The two-program staged path (cs_cands_step + map_step_*_from_cands —
    the long-read lever that keeps any single compiled program small) must be
    BIT-identical to the fused map_step for every result field."""
    from nextgenmap_tpu.index.genome import Genome
    from nextgenmap_tpu.models.mapper import Mapper

    g = random_genome(80_000, seed=9)
    reads = simulate_reads(g, 32, read_len=150, snp_rate=0.03,
                           indel_rate=0.003, seed=10)
    codes = np.full((32, 150), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, : r.codes.shape[0]] = r.codes
    lens = np.array([min(150, r.codes.shape[0]) for r in reads], np.int32)
    import tempfile

    d = tempfile.mkdtemp()
    write_fasta(f"{d}/ref.fa", [("chr1", decode_seq(g))])
    genome = Genome.open(f"{d}/ref.fa", skip_save=True)
    cfg = NgmConfig(batch_size=32, skip_save=True)
    mapper = Mapper(cfg, genome, 150)

    monkeypatch.setenv("NGM_STAGED", "never")
    fused = (mapper.map_batch_paired(codes, lens) if paired
             else mapper.map_batch(codes, lens))
    monkeypatch.setenv("NGM_STAGED", "always")
    staged = (mapper.map_batch_paired(codes, lens) if paired
              else mapper.map_batch(codes, lens))
    for f in fused._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, f)), np.asarray(getattr(staged, f)), f
        )


def test_long_read_batch_autoshrink(tmp_path):
    """Default batch sizes shrink for long reads so the traceback direction
    matrix stays bounded (runner long-read scaling)."""
    g = random_genome(60_000, seed=3)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    reads = simulate_reads(g, 8, read_len=600, snp_rate=0.01, seed=4)
    write_fastq(str(tmp_path / "r.fq"), reads)
    import nextgenmap_tpu.pipeline.runner as R

    seen = {}
    orig = R.Mapper

    class Spy(orig):
        def __post_init__(self):
            seen["batch"] = self.cfg.batch_size
            super().__post_init__()

    R.Mapper, old = Spy, R.Mapper
    try:
        rc = main([
            "map", "-r", str(tmp_path / "ref.fa"), "-q", str(tmp_path / "r.fq"),
            "-o", str(tmp_path / "o.sam"), "-k", "13", "--no-progress",
            "--skip-save",
        ])
    finally:
        R.Mapper = old
    assert rc == 0
    assert seen["batch"] < NgmConfig().batch_size
    assert seen["batch"] % 2 == 0
