"""spark-submit entry point: K-feature point-in-time ASSEMBLY from a
skinny EAV feature log — the feature-store read path (north-rule
"full as-of/point-in-time join" over the one-log-many-features layout;
companion to jobs/build_features.py, which builds features from raw
turns).

Usage (cluster):
    spark-submit --py-files asl_engine.zip jobs/assemble_features.py \
        --input /path/transcripts --log /path/feature_log \
        --sources f0,f1,f2,f3 --output /path/assembled

Strategies (operators/asof.py; BASELINE.md §7.9/§7.12/§7.13):
  single_pass — asof_join_skinny: ONE Exchange + Sort + Window over
      n_probe + n_log rows. Best when probe and log are comparably
      sized and unbucketed.
  intervals   — asof_join_skinny_intervals: widen the log once into
      K-vector validity intervals (shuffle proportional to the LOG),
      then a sort-merge interval join; the probe table is never
      shuffled or sorted when it is bucketed. Best when the probe is
      bucketed or much larger than the log — the 10^12-turn regime.
  auto        — intervals when the log row count is < --auto-ratio of
      the probe's (default 1/4), else single_pass.
  routed      — asof_join_skinny_routed: hot entities (change points >=
      --hot-threshold) take the union path, the tail keeps the interval
      SMJ (BASELINE.md §7.15's 11x hot-shard fix). Use on skewed
      corpora.

With --synth N_CONVS the job generates the deterministic synthetic
transcripts table plus an EAV log derived from it (bench/demo path, no
external data). Output goes through the idempotent SnapshotWriter
(snapshot id = --snapshot-id for resumable re-runs) with row counts
read back from the manifest, like build_features.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="probe table parquet path (conv_id, ts, ...)")
    p.add_argument("--log", help="skinny EAV feature log parquet path "
                                 "(conv_id, ts, feature, value)")
    p.add_argument("--sources", default="",
                   help="comma-separated feature names to assemble "
                        "(default: every distinct value in --log's "
                        "feature column)")
    p.add_argument("--strategy", default="auto",
                   choices=["auto", "single_pass", "intervals", "routed"])
    p.add_argument("--hot-threshold", type=int, default=1024,
                   help="(routed) change points per entity above which "
                        "the union path takes over from the interval SMJ")
    p.add_argument("--auto-ratio", type=float, default=0.25,
                   help="auto picks intervals when n_log < ratio * n_probe")
    p.add_argument("--strict", action="store_true",
                   help="exclude equal-ts feature updates (state strictly "
                        "before each probe ts)")
    p.add_argument("--output", help="SnapshotWriter table root")
    p.add_argument("--snapshot-id", default=None)
    p.add_argument("--synth", type=int, default=0,
                   help="generate N synthetic conversations + a derived "
                        "EAV log instead of --input/--log")
    p.add_argument("--mean-turns", type=int, default=20)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from amazon_security_lake_transformation_library_spark.operators.asof import (
        asof_join_skinny,
        asof_join_skinny_intervals,
    )
    from amazon_security_lake_transformation_library_spark.session import get_spark

    spark = get_spark("assemble-features")
    t0 = time.time()

    if args.synth:
        from amazon_security_lake_transformation_library_spark.synth.transcripts import (
            gen_feature_log, gen_transcripts, write_parquet,
        )

        tmp = tempfile.mkdtemp(prefix="assemble_")
        pdf = gen_transcripts(n_convs=args.synth, mean_turns=args.mean_turns)
        write_parquet(pdf, f"{tmp}/transcripts.parquet")
        write_parquet(gen_feature_log(pdf), f"{tmp}/feature_log.parquet")
        args.input = f"{tmp}/transcripts.parquet"
        args.log = f"{tmp}/feature_log.parquet"

    if not args.input or not args.log:
        print("error: --input and --log (or --synth) required", file=sys.stderr)
        return 2

    probe = spark.read.parquet(args.input)
    log = spark.read.parquet(args.log)
    sources = [s for s in args.sources.split(",") if s] or [
        r[0] for r in sorted(log.select("feature").distinct().collect())
    ]

    strategy = args.strategy
    if strategy == "auto":
        n_probe, n_log = probe.count(), log.count()
        strategy = (
            "intervals" if n_log < args.auto_ratio * n_probe else "single_pass"
        )
        print(f"auto: n_probe={n_probe} n_log={n_log} -> {strategy}",
              file=sys.stderr)

    if strategy == "routed":
        from amazon_security_lake_transformation_library_spark.operators.asof import (
            asof_join_skinny_routed,
        )

        out = asof_join_skinny_routed(
            probe, log, sources, strict=args.strict,
            hot_threshold_changes=args.hot_threshold,
        )
    else:
        fn = (
            asof_join_skinny_intervals if strategy == "intervals"
            else asof_join_skinny
        )
        out = fn(probe, log, sources, strict=args.strict)

    if args.output:
        from amazon_security_lake_transformation_library_spark.plans.writer import (
            SnapshotWriter, new_snapshot_id,
        )

        writer = SnapshotWriter(args.output)
        snap = args.snapshot_id or new_snapshot_id()
        stamped = out.withColumn(
            "eventday", F.date_format(F.col("ts").cast("timestamp"), "yyyyMMdd")
        )
        committed = writer.commit(
            stamped, snapshot_id=snap, partition_cols=["eventday"]
        )
        mf = writer.manifest(spark)
        n_rows = (
            mf.filter(F.col("snapshot_id") == snap)
            .agg(F.sum("row_count")).collect()[0][0]
            or 0  # empty output commits no manifest rows -> sum is NULL
        )
        print(f"snapshot={snap} committed={committed}", file=sys.stderr)
    else:
        n_rows = out.count()

    wall = time.time() - t0
    print(json.dumps({
        "rows": int(n_rows),
        "strategy": strategy,
        "sources": sources,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
