"""Scalar NumPy banded-SW oracle mirroring ops/sw_ref.py semantics exactly.

Same band parametrization (ref j = i + o, o in [0, W)), same affine
recurrences, same tie-breaks (DESIGN.md rule 10): stop > diag > up(E) >
left(F); gap states prefer open over extend on ties; best cell prefers
smallest (i, then j).  Integer DP, so tests assert exact equality.
"""

from __future__ import annotations

import numpy as np

NEG = -(2**30)
OP_M, OP_I, OP_D = 0, 1, 2


def banded_sw_oracle(query, qlen, ref, matrix, gopen_q, gopen_r, gext, band,
                     mode="local"):
    """Returns dict with score/end_i/end_o and traceback fields for ONE pair.

    mode="local" is classic SW; mode="glocal" is --end-to-end: the WHOLE
    query must be consumed (no clipping; scores may dip negative mid-read),
    ref start/end stay free within the corridor.
    """
    glocal = mode == "glocal"
    L = len(query)
    W = band
    T = len(ref)
    assert T >= L + W - 1 + 1, "corridor too short"
    H = np.zeros((L + 1, W), dtype=np.int64)  # H[i+1] = row i
    E = np.full((L + 1, W), NEG, dtype=np.int64)
    # per-cell: hsrc(0 stop,1 diag,2 E,3 F), e_ext bit, f_ext bit
    HSRC = np.zeros((L, W), dtype=np.int8)
    EEXT = np.zeros((L, W), dtype=np.int8)
    FEXT = np.zeros((L, W), dtype=np.int8)
    best, bi, bo = 0, 0, 0
    for i in range(L):
        F = NEG
        htmp_row = np.zeros(W, dtype=np.int64)
        for o in range(W):
            j = i + o
            s = matrix[query[i], ref[j]] if j < T else -abs(matrix).max()
            hd = H[i, o] + s
            h_up = H[i, o + 1] if o + 1 < W else NEG
            e_up = E[i, o + 1] if o + 1 < W else NEG
            e_open = h_up - gopen_q
            e_ext = e_up - gext
            e = max(e_open, e_ext)
            EEXT[i, o] = 1 if e_ext > e_open else 0
            htmp = max(hd, e) if glocal else max(0, hd, e)
            htmp_row[o] = htmp
            if o == 0:
                f = NEG
                FEXT[i, o] = 0
            else:
                f_ext_term = F - gext
                f_open_term = htmp_row[o - 1] - gopen_r
                f = max(f_ext_term, f_open_term)
                FEXT[i, o] = 1 if f_ext_term > f_open_term else 0
            F = f
            h = max(htmp, f)
            H[i + 1, o] = h
            E[i + 1, o] = e
            if not glocal and h <= 0:
                HSRC[i, o] = 0
            elif h == hd:
                HSRC[i, o] = 1
            elif h == e:
                HSRC[i, o] = 2
            else:
                HSRC[i, o] = 3
        row_eligible = (i == qlen - 1) if glocal else (i < qlen)
        if row_eligible:
            rowmax = int(H[i + 1].max())
            # best stays 0 when a glocal alignment only scores <= 0 —
            # downstream treats that as unalignable, same as local
            if rowmax > best:
                best = rowmax
                bi = i
                bo = int(np.argmax(H[i + 1]))
    res = {"score": best, "end_i": bi, "end_o": bo}

    # traceback
    ops = []
    matches = mismatches = indels = 0
    i, o, ph = bi, bo, "H"
    qs, rs = bi, bi + bo
    if best > 0:
        while 0 <= i < L and 0 <= o < W:
            if ph == "H":
                src = HSRC[i, o]
                if src == 0:
                    break
                if src == 1:
                    ops.append(OP_M)
                    # "match" = positively-scored column (counts tolerated
                    # bisulfite/SLAM conversions; == exact equality for the
                    # default matrix) — mirrors ops/sw_ref.py::_dirs
                    if matrix[query[i], ref[i + o]] > 0:
                        matches += 1
                    else:
                        mismatches += 1
                    qs = i
                    rs = i + o
                    i -= 1
                elif src == 2:
                    ph = "E"
                else:
                    ph = "F"
            elif ph == "E":
                ops.append(OP_I)
                indels += 1
                qs = i
                ph = "E" if EEXT[i, o] else "H"
                i, o = i - 1, o + 1
            else:  # F
                ops.append(OP_D)
                indels += 1
                rs = i + o
                ph = "F" if FEXT[i, o] else "H"
                o -= 1
    res.update(
        ops=ops,  # END->START order, same as device kernel
        matches=matches, mismatches=mismatches, indels=indels,
        q_start=qs, q_end=bi, r_start=rs, r_end=bi + bo,
    )
    return res


def cigar_from_ops(ops_end_to_start, q_start, q_end, qlen, hard=False):
    """RLE ops (given end->start) into a CIGAR string with soft clips."""
    ops = list(reversed(ops_end_to_start))
    out = []
    clip = "H" if hard else "S"
    if q_start > 0:
        out.append(f"{q_start}{clip}")
    i = 0
    sym = {OP_M: "M", OP_I: "I", OP_D: "D"}
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{sym[ops[i]]}")
        i = j
    if qlen - 1 - q_end > 0:
        out.append(f"{qlen - 1 - q_end}{clip}")
    return "".join(out)
