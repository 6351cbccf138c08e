"""Multi-process memory-LATENCY probe — the third bracketing axis.

Why three probes: a Spark feature job has three hardware appetites, and
each can degrade independently on a shared host —
  * ALU/scheduling  -> tools/cpu_probe.py   (md5 over an L1 buffer)
  * DRAM bandwidth  -> tools/membw_probe.py (numpy stream copy)
  * DRAM latency    -> this file            (dependent pointer chase)
Observed 2026-08-17: a window passed BOTH the ALU probe (ratio 3.6-4.3)
and the bandwidth probe (57-70 GB/s @4p) while the fused flagship's
reduce stage (sort + window block + SMJ — pointer-chasing, latency-bound)
inflated from 78.7 CPU-seconds at 4-way to 866.7 CPU-seconds at 16-way
on byte-identical shuffle input (11x, vs 1.36-1.73x in healthy windows,
BASELINE.md §5.5) and the map stage (streaming) inflated only 1.2x. Only
a latency probe can bracket that state.

Each worker walks a random permutation cycle over a 256 MB array of
8-byte indices: every load depends on the previous one, so the measured
rate IS 1/latency, no prefetch, no ILP. Reported per level: aggregate
chases/s at 4 and 16 processes plus the ratio — a healthy host shows
ratio near 4 (latency is per-core, far from bandwidth saturation); a
latency-degraded host shows per-process rate collapsing as concurrency
grows (ratio << 4).

Usage: python tools/memlat_probe.py [--mb 256] [--chases 20000000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _chase(mb: int, chases: int, q) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(12345)
    perm = rng.permutation(n).astype(np.int64)
    # build a single cycle: nxt[perm[i]] = perm[i+1]
    nxt = np.empty(n, dtype=np.int64)
    nxt[perm[:-1]] = perm[1:]
    nxt[perm[-1]] = perm[0]
    # vectorized dependent walk: each fancy-index step is itself a serial
    # chain of dependent loads per element; walking a BATCH of cursors
    # keeps numpy overhead amortized while every load still misses cache
    cursors = perm[:4096].copy()
    steps = max(1, chases // len(cursors))
    t0 = time.time()
    for _ in range(steps):
        cursors = nxt[cursors]
    dt = time.time() - t0
    q.put(steps * len(cursors) / dt)


def aggregate_rate(procs: int, mb: int, chases: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_chase, args=(mb, chases, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--chases", type=int, default=20_000_000)
    args = ap.parse_args()
    r4 = aggregate_rate(4, args.mb, args.chases)
    r16 = aggregate_rate(16, args.mb, args.chases)
    print(json.dumps({
        "p4_agg_chases_per_s": round(r4),
        "p16_agg_chases_per_s": round(r16),
        "ratio_16_over_4": round(r16 / r4, 2),
    }))


if __name__ == "__main__":
    main()
