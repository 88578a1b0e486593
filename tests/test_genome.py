import numpy as np

from nextgenmap_tpu.index.genome import CHROM_GAP, Genome
from nextgenmap_tpu.io.fasta import write_fasta


def test_from_fasta_and_coords(tmp_path):
    p = str(tmp_path / "ref.fa")
    write_fasta(p, [("chrA", "ACGT" * 25), ("chrB", "TTTTGGGG")])
    g = Genome.from_fasta(p)
    assert g.names == ["chrA", "chrB"]
    assert g.lengths.tolist() == [100, 8]
    assert g.starts.tolist() == [0, 100 + CHROM_GAP]
    # gap region is PAD
    assert (g.codes[100 : 100 + CHROM_GAP] == 4).all()
    idx, off = g.abs_to_chrom(int(g.starts[1]) + 3)
    assert (int(idx), int(off)) == (1, 3)
    idx, off = g.abs_to_chrom(50)
    assert (int(idx), int(off)) == (0, 50)
    assert g.chrom_to_abs(1, 0) == int(g.starts[1])


def test_extract_bounds(toy_genome):
    out = toy_genome.extract(-5, 10)
    assert out.shape == (10,)
    assert (out[:5] == 4).all()
    assert np.array_equal(out[5:], toy_genome.codes[:5])
    out2 = toy_genome.extract(toy_genome.size - 3, 8)
    assert (out2[3:] == 4).all()


def test_memoize_roundtrip(tmp_path):
    p = str(tmp_path / "ref.fa")
    write_fasta(p, [("c1", "ACGTACGTAC"), ("c2", "GGGCCC")])
    g1 = Genome.open(p)
    g2 = Genome.open(p)  # from cache
    assert g1.names == g2.names
    assert np.array_equal(g1.codes, g2.codes)
    assert g1.sha1() == g2.sha1()
