"""Directive: host-inclusive CLI wall-clock re-measure (SE + PE, 200k reads).

Round-2's host-inclusive streaming figures (102.3k SE / 89.1k PE) were
parsed from the runner's own progress lines during dispatched-loop-era
runs.  Wall-clock over the whole `ngm-tpu map` process is the one protocol
the axon relay cannot fake (results must be on disk when the process
exits), so this driver times exactly that: E. coli-scale genome (4.6 Mbp),
200k simulated 100 bp reads, full CLI, `-t 4`.

Reports total wall, plus streaming wall with the one-time costs (device
index build + jit compile, read off the runner's phase log) subtracted —
both printed so nothing hides.

  NGM_HOSTCLI_MODE=se|pe   (default se)
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WS = os.environ.get("NGM_HOSTCLI_DIR", "/root/hostcli")
MODE = os.environ.get("NGM_HOSTCLI_MODE", "se")
N_READS = int(os.environ.get("NGM_HOSTCLI_READS", 200_000))
GSIZE = 4_600_000
L = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_inputs():
    from nextgenmap_tpu.io.encode import decode_seq
    from nextgenmap_tpu.io.simulate import random_genome, simulate_reads_fast

    os.makedirs(WS, exist_ok=True)
    ref = f"{WS}/ref.fa"
    g = random_genome(GSIZE, seed=7)
    if not os.path.exists(ref):
        with open(ref + ".tmp", "w") as f:
            f.write(">chr1\n")
            f.write(decode_seq(g))
            f.write("\n")
        os.replace(ref + ".tmp", ref)

    def write_fq(path, codes, names):
        qual = "I" * codes.shape[1]
        lut = np.frombuffer(b"ACGT", np.uint8)
        with open(path + ".tmp", "w") as f:
            for i in range(codes.shape[0]):
                seq = lut[codes[i]].tobytes().decode()
                f.write(f"@{names[i]}\n{seq}\n+\n{qual}\n")
        os.replace(path + ".tmp", path)

    if MODE == "se":
        fq = f"{WS}/se.fq"
        if not os.path.exists(fq):
            # simulate_reads_fast already places ~50% of reads on the
            # reverse strand (returns truth_strand); encode THAT in the
            # name so a strand-accuracy check stays honest
            codes, tp, ts = simulate_reads_fast(
                g, N_READS, read_len=L, snp_rate=0.02, seed=8)
            names = [f"r_{int(tp[i])}_{int(ts[i])}" for i in range(N_READS)]
            write_fq(fq, codes, names)
        return ref, (fq,)

    # PE: vectorized FR pairs — mate1 fwd at p, mate2 revcomp at p+ins-L
    fq1, fq2 = f"{WS}/pe_1.fq", f"{WS}/pe_2.fq"
    if not (os.path.exists(fq1) and os.path.exists(fq2)):
        n = N_READS // 2
        rng = np.random.default_rng(10)
        ins = np.clip(rng.normal(350, 40, n).astype(np.int64), L + 10, 600)
        pos = rng.integers(0, GSIZE - 700, size=n)
        idx = np.arange(L)
        w1 = g[pos[:, None] + idx[None, :]].copy()
        p2 = pos + ins - L
        w2 = g[p2[:, None] + idx[None, :]].copy()
        for w in (w1, w2):
            m = rng.random((n, L)) < 0.02
            w[m] = (w[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        w2 = (3 - w2)[:, ::-1]
        names = [f"p_{int(pos[i])}_{int(p2[i])}" for i in range(n)]
        write_fq(fq1, w1, names)
        write_fq(fq2, w2, names)
    return ref, (fq1, fq2)


def main():
    ref, fqs = build_inputs()
    out = f"{WS}/out-{MODE}.sam"
    args = [sys.executable, "-m", "nextgenmap_tpu.cli", "map",
            "-r", ref, "-o", out, "-t", "4"]
    args += ["-q", fqs[0]] if MODE == "se" else ["-1", fqs[0], "-2", fqs[1]]
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    side = f"{WS}/cli-{MODE}.log"
    t0 = time.time()
    try:
        with open(side, "w") as sf:
            p = subprocess.run(args, env=env, stdout=sf, stderr=sf,
                               timeout=int(os.environ.get(
                                   "NGM_HOSTCLI_TIMEOUT", 1800)))
    except subprocess.TimeoutExpired:
        sys.stderr.write(open(side).read()[-2500:])
        print(json.dumps({"mode": MODE, "error": "timeout"}))
        return
    wall = time.time() - t0
    txt = open(side).read()
    sys.stderr.write(txt[-2500:])
    if p.returncode != 0:
        print(json.dumps({"mode": MODE, "error": p.returncode}))
        return
    # the runner's exit summary: R/S is reads over the WHOLE process
    # (index build + compile included); "streaming" is reads/s measured
    # from the first emitted batch — both host wall-clock figures the
    # relay cannot fake (the SAM bytes are on disk when the process exits)
    m = re.findall(r"R/S: (\d+) \(streaming: (\d+)\)", txt)
    n = sum(1 for line in open(out) if not line.startswith("@"))
    mapped = sum(1 for line in open(out)
                 if not line.startswith("@")
                 and not int(line.split("\t", 3)[1]) & 4)
    print(json.dumps({
        "mode": MODE, "reads": n, "mapped": mapped,
        "wall_s": round(wall, 1),
        "reads_per_s_total_wall": round(n / wall, 0),
        "runner_rs": int(m[-1][0]) if m else None,
        "runner_streaming_rs": int(m[-1][1]) if m else None,
    }))


if __name__ == "__main__":
    main()
