"""Paired-end tests: insert-window pair selection, proper flags, TLEN,
broken-pair fallback, interleaved equivalence (SURVEY.md §4 item 5)."""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import (
    random_genome, simulate_pairs, write_fastq,
)

N_PAIRS = 40


@pytest.fixture(scope="session")
def pe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pe")
    g = random_genome(60_000, seed=33)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    pairs = simulate_pairs(g, N_PAIRS, read_len=100, insert_mean=350,
                           insert_sd=30, snp_rate=0.02, seed=7)
    write_fastq(str(d / "r1.fq"), [p[0] for p in pairs])
    write_fastq(str(d / "r2.fq"), [p[1] for p in pairs])
    inter = []
    for a, b in pairs:
        inter.extend([a, b])
    write_fastq(str(d / "inter.fq"), inter)
    (d / "truth.txt").write_text(
        "\n".join(f"{a.name} {a.pos} {b.pos}" for a, b in pairs)
    )
    return d


def run_pe(d, out, args):
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-o", str(d / out),
        "-k", "11", "--batch-size", "64", "--no-progress", *args,
    ])
    assert rc == 0
    return [
        l.split("\t") for l in (d / out).read_text().splitlines()
        if not l.startswith("@")
    ]


def test_paired_proper_mapping(pe_dir):
    recs = run_pe(pe_dir, "pe.sam", ["-1", str(pe_dir / "r1.fq"), "-2", str(pe_dir / "r2.fq")])
    assert len(recs) == 2 * N_PAIRS
    truth = {}
    for line in (pe_dir / "truth.txt").read_text().splitlines():
        name, p1, p2 = line.split()
        truth[name] = (int(p1), int(p2))
    n_proper = n_correct = 0
    for f in recs:
        flag = int(f[1])
        assert flag & 0x1  # paired flag always set
        assert (flag & 0x40) or (flag & 0x80)  # first/second set
        if flag & 0x4:
            continue
        if flag & 0x2:
            n_proper += 1
        p1, p2 = truth[f[0]]
        expect = p1 if flag & 0x40 else p2
        if abs(int(f[3]) - 1 - expect) <= 5:
            n_correct += 1
    assert n_proper >= 2 * N_PAIRS * 0.95
    assert n_correct >= 2 * N_PAIRS * 0.95


def test_tlen_and_mate_fields(pe_dir):
    recs = run_pe(pe_dir, "pe2.sam", ["-1", str(pe_dir / "r1.fq"), "-2", str(pe_dir / "r2.fq")])
    by_name = {}
    for f in recs:
        by_name.setdefault(f[0], []).append(f)
    for name, fs in by_name.items():
        assert len(fs) == 2
        a, b = fs
        if int(a[1]) & 0x4 or int(b[1]) & 0x4:
            continue
        # mate coordinates cross-reference
        assert a[6] == "=" and b[6] == "="
        assert int(a[7]) == int(b[3])
        assert int(b[7]) == int(a[3])
        # TLEN: equal magnitude, opposite sign, within the insert window
        ta, tb = int(a[8]), int(b[8])
        assert ta == -tb and ta != 0
        assert 150 <= abs(ta) <= 600
        # FR orientation: exactly one reverse flag
        assert bool(int(a[1]) & 0x10) != bool(int(b[1]) & 0x10)


def test_interleaved_equivalence(pe_dir):
    a = run_pe(pe_dir, "two.sam", ["-1", str(pe_dir / "r1.fq"), "-2", str(pe_dir / "r2.fq")])
    b = run_pe(pe_dir, "int.sam", ["-q", str(pe_dir / "inter.fq"), "-p"])
    assert a == b


def test_broken_pair_fallback(pe_dir, tmp_path):
    """Mates from loci 20kb apart: no insert-consistent pair exists; both
    must still map individually without the proper flag."""
    g = random_genome(60_000, seed=33)
    from nextgenmap_tpu.io.encode import revcomp_codes
    from nextgenmap_tpu.io.simulate import SimRead

    r1 = SimRead("broken_0", g[5000:5100].copy(), 0, 5000, 0, 0, 0)
    r2 = SimRead("broken_0", revcomp_codes(g[25000:25100].copy()), 0, 25000, 1, 0, 0)
    d = tmp_path
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(str(d / "b1.fq"), [r1])
    write_fastq(str(d / "b2.fq"), [r2])
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-1", str(d / "b1.fq"),
        "-2", str(d / "b2.fq"), "-o", str(d / "b.sam"),
        "-k", "11", "--batch-size", "64", "--no-progress",
    ])
    assert rc == 0
    recs = [l.split("\t") for l in (d / "b.sam").read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    for f in recs:
        flag = int(f[1])
        assert not flag & 0x4, "broken mates must still map individually"
        assert not flag & 0x2, "must not be flagged proper"
    assert abs(int(recs[0][3]) - 1 - 5000) <= 5
    assert abs(int(recs[1][3]) - 1 - 25000) <= 5


def test_mate_unmapped_convention(pe_dir, tmp_path):
    g = random_genome(60_000, seed=33)
    from nextgenmap_tpu.io.simulate import SimRead

    rng = np.random.default_rng(3)
    r1 = SimRead("mu_0", g[8000:8100].copy(), 0, 8000, 0, 0, 0)
    r2 = SimRead("mu_0", rng.integers(0, 4, 100).astype(np.uint8), 0, 0, 1, 0, 0)
    d = tmp_path
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(str(d / "m1.fq"), [r1])
    write_fastq(str(d / "m2.fq"), [r2])
    rc = main([
        "map", "-r", str(d / "ref.fa"), "-1", str(d / "m1.fq"),
        "-2", str(d / "m2.fq"), "-o", str(d / "m.sam"),
        "-k", "11", "--batch-size", "64", "--no-progress",
    ])
    assert rc == 0
    recs = [l.split("\t") for l in (d / "m.sam").read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    f1 = next(f for f in recs if int(f[1]) & 0x40)
    f2 = next(f for f in recs if int(f[1]) & 0x80)
    assert not int(f1[1]) & 0x4
    assert int(f1[1]) & 0x8          # mate unmapped
    assert int(f2[1]) & 0x4          # unmapped
    # unmapped mate inherits partner's coordinates
    assert f2[2] == "chr1" and int(f2[3]) == int(f1[3])


def test_insert_window_edges(tmp_path):
    """Insert-window boundary semantics (VERDICT r2 directive 6): propriety
    is recomputed from EXACT post-traceback coordinates (pair/resolve.py), so
    the [-I, -X] window is sharp — insert == -I or == -X is proper, one base
    outside is broken.  No unspecified margin band remains (the ±2·bin_w
    fuzz only affects device-side candidate-pair SELECTION, never the flag)."""
    from nextgenmap_tpu.io.encode import revcomp_codes
    from nextgenmap_tpu.io.fastq import ReadRecord

    g = random_genome(80_000, seed=44)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", decode_seq(g))])
    L = 100
    lo, hi = 200, 600        # -I 200 -X 600
    cases = [  # (name, insert, expect_proper)
        ("well_inside", 400, True),
        ("at_lo", lo, True),
        ("at_hi", hi, True),
        ("below_lo", lo - 1, False),
        ("above_hi", hi + 1, False),
        ("far_below", lo - 92, False),
        ("far_above", hi + 152, False),
    ]
    r1s, r2s = [], []
    for i, (name, insert, _) in enumerate(cases):
        p = 2000 + i * 3000
        m1 = g[p : p + L].copy()
        m2 = revcomp_codes(g[p + insert - L : p + insert].copy())
        r1s.append(ReadRecord(f"{name}/1", m1, b"I" * L))
        r2s.append(ReadRecord(f"{name}/2", m2, b"I" * L))
    write_fastq(str(tmp_path / "e1.fq"), r1s)
    write_fastq(str(tmp_path / "e2.fq"), r2s)
    recs = run_pe(tmp_path, "edges.sam",
                  ["-1", str(tmp_path / "e1.fq"), "-2", str(tmp_path / "e2.fq"),
                   "-I", str(lo), "-X", str(hi)])
    by_name = {}
    for f in recs:
        by_name.setdefault(f[0], []).append(int(f[1]))
    for name, insert, expect in cases:
        flags = by_name[name]
        assert len(flags) == 2
        got = all(fl & 2 for fl in flags)
        assert got == expect, (name, insert, flags)
        # both mates still MAP individually even when the pair is broken
        assert all(not fl & 4 for fl in flags), (name, flags)
