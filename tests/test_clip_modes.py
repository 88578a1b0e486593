"""Clip-rendering modes + bisulfite --bs-cutoff (SURVEY.md §2.1 flags)."""

import numpy as np

from nextgenmap_tpu.io.sam import OP_D, OP_I, OP_M, cigar_string
from nextgenmap_tpu.ops.kmer import extract_kmers


def _ops(seq):  # host helper: ops are stored END->START
    return np.array(seq[::-1], np.uint8)


def test_cigar_clip_modes():
    # 10 aligned M with 3 clipped at head, 2 at tail of a 15bp read
    ops = _ops([OP_M] * 10)
    assert cigar_string(ops, 10, 3, 12, 15) == "3S10M2S"
    assert cigar_string(ops, 10, 3, 12, 15, hard_clip=True) == "3H10M2H"
    assert cigar_string(ops, 10, 3, 12, 15, silent_clip=True) == "10M"
    # interior ops unaffected by the clip mode
    ops2 = _ops([OP_M] * 4 + [OP_I] * 2 + [OP_M] * 3 + [OP_D] + [OP_M])
    assert cigar_string(ops2, 11, 0, 9, 10) == "4M2I3M1D1M"
    assert cigar_string(ops2, 11, 0, 9, 10, silent_clip=True) == "4M2I3M1D1M"


def test_bs_cutoff_drops_c_rich_kmers():
    # read: 5 C's then A/G/T mix — with k=5 the first windows are C-saturated
    seq = np.array([1, 1, 1, 1, 1, 0, 3, 0, 3, 0, 3, 0, 3], np.uint8)[None, :]
    lens = np.array([13], np.int32)
    _, ok_all = extract_kmers(seq, lens, k=5, collapse="ct")
    _, ok_cut = extract_kmers(seq, lens, k=5, collapse="ct", max_collapsed=2)
    ok_all = np.asarray(ok_all[0])
    ok_cut = np.asarray(ok_cut[0])
    assert ok_all.all()
    assert not ok_cut[0]            # CCCCC: 5 C's > 2
    assert ok_cut[5:].all()         # windows past the C run survive
    assert ok_cut.sum() < ok_all.sum()
    # cutoff only applies in collapse modes
    _, ok_none = extract_kmers(seq, lens, k=5, collapse="none", max_collapsed=2)
    assert np.asarray(ok_none[0]).all()
