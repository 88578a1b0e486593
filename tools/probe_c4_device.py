"""Config-4 device-side rate: the sharded megascan alone, truth protocol.

The CLI streaming figure bundles device time, the relay's per-dispatch +
fetch round-trips, and host SAM emission on this sandbox's single CPU.
This probe isolates the DEVICE-FACING part the way production runs it:
`Mapper.map_batch_scan` (map_step_sharded_megascan, K batches x S shards in
one program) on the memoized 1.2 Gbp workspace, each group's results
fetched through the production single-buffer wire (utils/wire.fetch_packed)
before the clock stops, truth-checked per batch.

  NGM_C4_DIR=/root/c4ws  NGM_C4_K=14  NGM_C4_SHARDS=4  NGM_C4_MB=4
  NGM_PROBE_GROUPS=6   (timed groups after the compile/warm group)

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WS = os.environ.get("NGM_C4_DIR", "/root/c4ws")
K = int(os.environ.get("NGM_C4_K", 14))
SHARDS = int(os.environ.get("NGM_C4_SHARDS", 4))
MB = int(os.environ.get("NGM_C4_MB", 4))
B = int(os.environ.get("NGM_C4_B", 4096))
GROUPS = int(os.environ.get("NGM_PROBE_GROUPS", 6))
READ_LEN = 150


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_reads(path, n):
    codes = np.zeros((n, READ_LEN), np.uint8)
    names = []
    lut = np.full(256, 4, np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    with open(path) as f:
        for r in range(n):
            name = f.readline().strip()[1:]
            seq = f.readline().strip()
            f.readline(); f.readline()
            if not seq:
                raise SystemExit(f"reads file has only {r} reads, need {n}")
            names.append(name)
            codes[r] = lut[np.frombuffer(seq.encode(), np.uint8)][:READ_LEN]
    return codes, names


def main() -> None:
    from nextgenmap_tpu.config import NgmConfig
    from nextgenmap_tpu.models.mapper import Mapper
    from nextgenmap_tpu.parallel.index_shard import open_sharded
    from nextgenmap_tpu.pipeline.runner import load_reference
    from nextgenmap_tpu.utils.wire import fetch_packed

    cfg = NgmConfig(kmer=K, index_shards=SHARDS, batch_size=B, megabatch=MB)
    ref = f"{WS}/ref.fa"
    n_reads = B * MB * (GROUPS + 1)
    t0 = time.time()
    codes, names = load_reads(f"{WS}/reads-plain.fq", n_reads)
    log(f"reads: {time.time()-t0:.0f}s")
    t0 = time.time()
    genome, index = load_reference(cfg, ref)
    index = open_sharded(cfg, ref, genome, index)
    mapper = Mapper(cfg, genome, READ_LEN, index)
    log(f"reference+shards: {time.time()-t0:.0f}s")
    assert mapper.supports_megabatch()

    lens = np.full((MB, B), READ_LEN, np.int32)
    groups = codes.reshape(GROUPS + 1, MB, B, READ_LEN)

    def run(g):
        res = mapper.map_batch_scan(groups[g], lens)
        host = fetch_packed(res)     # ONE D2H round-trip, like production
        return type(res)(*[np.asarray(f) for f in host])

    t0 = time.time()
    first = run(0)
    log(f"compile+first group: {time.time()-t0:.0f}s")

    t0 = time.time()
    outs = [run(1 + g) for g in range(GROUPS)]
    dt = time.time() - t0

    # truth accuracy for every timed batch (names: r_<chrom>_<pos>_<strand>;
    # merged pos is in the genome's flat abs space incl. inter-chrom gaps)
    ok = tot = 0
    for g, res in enumerate(outs):
        base = (1 + g) * MB * B
        for kb in range(MB):
            p = res.pos[kb].astype(np.int64)
            mp = res.mapped[kb]
            st = res.strand[kb]
            for r in range(B):
                _, c, tp, ts = names[base + kb * B + r].split("_")
                gp = genome.chrom_to_abs(int(c), int(tp))
                tot += 1
                if mp[r] and abs(int(p[r]) - gp) <= 5 and int(st[r]) == int(ts):
                    ok += 1
    n = GROUPS * MB * B
    print(json.dumps({
        "mb": MB, "shards": SHARDS, "groups_timed": GROUPS,
        "ms_per_batch": round(dt / (GROUPS * MB) * 1e3, 1),
        "ms_per_group": round(dt / GROUPS * 1e3, 1),
        "reads_per_sec_device_fetch": round(n / dt, 0),
        "truth": f"{ok}/{tot}",
    }))


if __name__ == "__main__":
    main()
