from nextgenmap_tpu.io.encode import (  # noqa: F401
    CODE_A, CODE_C, CODE_G, CODE_T, CODE_N,
    encode_seq, decode_seq, revcomp_codes,
)
