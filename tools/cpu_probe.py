"""GIL-free multi-process CPU probe — the bracketing measurement behind
every scaling number in BASELINE.md (§5.1 method).

The sandbox's aggregate-CPU ceiling is time-varying (measured 16/4-process
ratios between 1.97 and 3.93 within hours), so every Spark scaling window
is bracketed by this probe: run it immediately before and after, report
the ratio alongside the efficiency, and the ceiling argument stays
falsifiable — a low Spark efficiency inside a low-probe window is host
contention, not engine design.

Each worker hashes a fixed buffer in a tight loop (md5: pure ALU, no
memory-bandwidth term, no GIL once inside hashlib), so the 16/4 aggregate
ratio measures exactly "how much CPU does this host actually grant 16
concurrent processes vs 4" — an upper bound no Spark job can beat.

Usage: python tools/cpu_probe.py [--dur 3.0]   # prints one JSON line
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _spin(dur: float, q) -> None:
    import hashlib

    buf = b"x" * 4096
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        hashlib.md5(buf).digest()
        n += 1
    q.put(n)


def aggregate_rate(procs: int, dur: float = 3.0) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(dur, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / dur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=3.0)
    args = ap.parse_args()
    r4 = aggregate_rate(4, args.dur)
    r16 = aggregate_rate(16, args.dur)
    print(json.dumps({
        "p4_hashes_per_s": round(r4),
        "p16_hashes_per_s": round(r16),
        "ratio_16_over_4": round(r16 / r4, 2),
    }))


if __name__ == "__main__":
    main()
