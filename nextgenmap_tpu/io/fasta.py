"""FASTA reading (plain or gzip).

Reference analog: kseq.h-based parsing inside SequenceProvider
(ref:src/SequenceProvider.cpp, ref:src/kseq.h).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import numpy as np

from nextgenmap_tpu.io.encode import encode_seq


def _open_text(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return f


def iter_fasta(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, uint8 code array) per record. Name is up to first whitespace."""
    name = None
    chunks: list[bytes] = []
    with _open_text(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    yield name, encode_seq(b"".join(chunks))
                name = line[1:].split()[0].decode("ascii")
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, encode_seq(b"".join(chunks))


def write_fasta(path: str, records: list[tuple[str, str]], width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")
