"""--end-to-end (glocal banded SW) tests (SURVEY.md §2 component 19's
end-to-end variant): kernel-vs-oracle exact equality + pipeline semantics."""

import numpy as np
import pytest

from nextgenmap_tpu.cli import main
from nextgenmap_tpu.io.encode import decode_seq
from nextgenmap_tpu.io.fasta import write_fasta
from nextgenmap_tpu.io.simulate import random_genome, simulate_reads, write_fastq
from nextgenmap_tpu.ops.sw_ref import banded_sw_align, banded_sw_score
from tests.oracle_sw import banded_sw_oracle

MAT = np.full((8, 8), -15, np.int32)
np.fill_diagonal(MAT, 10)
MAT[4:, :] = MAT[:, 4:] = -15


def _rand_batch(rng, n, L, W, mutate=0.1):
    T = L + W
    q = rng.integers(0, 4, (n, L)).astype(np.uint8)
    r = np.full((n, T), 4, np.uint8)
    for i in range(n):
        off = rng.integers(0, W // 2)
        r[i, :] = rng.integers(0, 4, T)
        r[i, off : off + L] = q[i]
        nmut = rng.integers(0, int(L * mutate) + 1)
        at = rng.integers(0, L, nmut)
        r[i, off + at] = rng.integers(0, 4, nmut)
    return q, r


def test_glocal_score_matches_oracle():
    rng = np.random.default_rng(31)
    L, W, n = 40, 16, 24
    q, r = _rand_batch(rng, n, L, W)
    lens = np.full(n, L, np.int32)
    res = banded_sw_score(q, lens, r, MAT, np.int32(20), np.int32(20),
                          np.int32(20), band=W, mode="glocal")
    for i in range(n):
        o = banded_sw_oracle(q[i], L, r[i], MAT, 20, 20, 20, W, mode="glocal")
        assert int(res.score[i]) == o["score"], i
        if o["score"] > 0:
            assert int(res.end_i[i]) == o["end_i"] == L - 1
            assert int(res.end_o[i]) == o["end_o"]


def test_glocal_align_matches_oracle_and_consumes_whole_read():
    rng = np.random.default_rng(32)
    L, W, n = 32, 16, 16
    q, r = _rand_batch(rng, n, L, W, mutate=0.15)
    lens = np.full(n, L, np.int32)
    res = banded_sw_align(q, lens, r, MAT, np.int32(20), np.int32(20),
                          np.int32(20), band=W, mode="glocal")
    for i in range(n):
        o = banded_sw_oracle(q[i], L, r[i], MAT, 20, 20, 20, W, mode="glocal")
        assert int(res.score[i]) == o["score"], i
        if o["score"] <= 0:
            continue
        no = int(res.n_ops[i])
        assert list(np.asarray(res.ops[i][:no])) == o["ops"], i
        # the whole read is consumed: no clipping possible
        assert int(res.q_start[i]) == 0
        assert int(res.q_end[i]) == L - 1
        assert int(res.matches[i]) == o["matches"]
        assert int(res.indels[i]) == o["indels"]


def test_glocal_vs_local_on_bad_tail():
    """A read whose tail is garbage: local clips it, glocal aligns through."""
    rng = np.random.default_rng(33)
    L, W = 50, 16
    q = rng.integers(0, 4, (1, L)).astype(np.uint8)
    r = np.full((1, L + W), 4, np.uint8)
    r[0, : L + W] = rng.integers(0, 4, L + W)
    r[0, 4 : 4 + L] = q[0]
    q[0, 40:] = 4  # N tail: scores -15 against every ref base, never matches
    lens = np.full(1, L, np.int32)
    args = (q, lens, r, MAT, np.int32(20), np.int32(20), np.int32(20))
    loc = banded_sw_align(*args, band=W, mode="local")
    glo = banded_sw_align(*args, band=W, mode="glocal")
    assert int(loc.q_end[0]) < L - 1          # local soft-clips the tail
    assert int(glo.q_end[0]) == L - 1         # glocal consumes it
    assert int(glo.score[0]) < int(loc.score[0])
    assert int(glo.mismatches[0]) >= 10


@pytest.fixture(scope="module")
def e2e_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_glocal")
    g = random_genome(30_000, seed=41)
    write_fasta(str(d / "ref.fa"), [("chr1", decode_seq(g))])
    write_fastq(str(d / "reads.fq"),
                simulate_reads(g, 200, read_len=100, snp_rate=0.02, seed=42))
    return d


def test_cli_end_to_end_no_clips(e2e_dir):
    d = e2e_dir
    rc = main(["map", "-r", str(d / "ref.fa"), "-q", str(d / "reads.fq"),
               "-o", str(d / "out.sam"), "-k", "11", "--batch-size", "64",
               "--end-to-end", "--no-progress", "--skip-save"])
    assert rc == 0
    mapped = 0
    for line in open(d / "out.sam"):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if int(f[1]) & 4:
            continue
        mapped += 1
        assert "S" not in f[5] and "H" not in f[5], f[5]
    assert mapped >= 190
