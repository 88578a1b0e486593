import numpy as np

from nextgenmap_tpu.io.encode import (
    CODE_N, decode_seq, encode_seq, revcomp_codes,
)


def test_encode_roundtrip():
    s = "ACGTacgtNnX"
    codes = encode_seq(s)
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]
    assert decode_seq(codes) == "ACGTACGTNNN"


def test_revcomp():
    codes = encode_seq("AACGTN")
    rc = revcomp_codes(codes)
    assert decode_seq(rc) == "NACGTT"
    # involution on ACGT-only
    c2 = encode_seq("ACGTGCTA")
    assert np.array_equal(revcomp_codes(revcomp_codes(c2)), c2)


def test_pad_is_n():
    assert CODE_N == 4
