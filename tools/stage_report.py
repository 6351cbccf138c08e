"""Per-stage evidence from Spark event logs (the falsifiable side of the
scaling-ceiling argument in BASELINE.md §5): for each stage, wall time,
summed executor run/GC/deserialize time, and shuffle bytes.

Usage: python tools/stage_report.py <event-log-file-or-dir> [...]
Prints one line per stage plus a totals line per application.

Reading the output for an N-vs-4N pair:
  * flat total executor CPU + ~4x lower wall  -> clean scaling
  * inflated executor CPU at 4N               -> shuffle serde / GC cost
  * flat CPU + <4x wall                       -> host contention /
    scheduling (compare against the bracketing CPU probes)
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def app_files(path: str):
    """Yield event-log FILES under path (handles the v2 rolling layout:
    eventlog_v2_<app>/events_*)."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith("."):
                continue
            sub = os.path.join(path, name)
            if os.path.isdir(sub):
                yield from app_files(sub)
            elif "appstatus" not in name:
                yield sub
    else:
        yield path


def report(path: str) -> None:
    stages: dict[int, dict] = defaultdict(
        lambda: {"run_ms": 0, "gc_ms": 0, "deser_ms": 0, "tasks": 0,
                 "sh_read": 0, "sh_write": 0, "wall_ms": 0, "name": "?"}
    )
    for line in open(path, encoding="utf-8", errors="replace"):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            s = stages[sid]
            s["tasks"] += 1
            s["run_ms"] += m.get("Executor Run Time", 0)
            s["gc_ms"] += m.get("JVM GC Time", 0)
            s["deser_ms"] += m.get("Executor Deserialize Time", 0)
            s["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            s["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
        elif kind == "SparkListenerStageCompleted":
            info = ev["Stage Info"]
            sid = info["Stage ID"]
            s = stages[sid]
            s["name"] = info.get("Stage Name", "?").split("\n")[0][:48]
            sub = info.get("Submission Time")
            comp = info.get("Completion Time")
            if sub and comp:
                s["wall_ms"] += comp - sub

    tot = {"run_ms": 0, "gc_ms": 0, "wall_ms": 0, "sh_read": 0, "sh_write": 0}
    print(f"== {path}")
    print(f"{'stage':>5} {'tasks':>5} {'wall_s':>8} {'cpu_s':>8} "
          f"{'gc_s':>6} {'shR_MB':>8} {'shW_MB':>8}  name")
    for sid in sorted(stages):
        s = stages[sid]
        print(f"{sid:>5} {s['tasks']:>5} {s['wall_ms']/1e3:>8.1f} "
              f"{s['run_ms']/1e3:>8.1f} {s['gc_ms']/1e3:>6.1f} "
              f"{s['sh_read']/1e6:>8.1f} {s['sh_write']/1e6:>8.1f}  {s['name']}")
        for k in ("run_ms", "gc_ms", "wall_ms"):
            tot[k] += s[k]
        tot["sh_read"] += s["sh_read"]
        tot["sh_write"] += s["sh_write"]
    print(f"TOTAL wall={tot['wall_ms']/1e3:.1f}s cpu={tot['run_ms']/1e3:.1f}s "
          f"gc={tot['gc_ms']/1e3:.1f}s shuffleR={tot['sh_read']/1e6:.0f}MB "
          f"shuffleW={tot['sh_write']/1e6:.0f}MB")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        for f in app_files(arg):
            report(f)
