"""Scale evidence for dedup.dedup_incremental (r5): input-scale
linearity + stage decomposition.

Why not an N-vs-4N wall cell: the incremental join shuffles its band
table on (band_id, bucket) — NOT conv-disjoint — so the sharded
storage-partitioned harness (tools/bench_scaling_sharded.py) cannot
represent it, and BASELINE.md §6.7/§6.11 document that multi-JVM
local-cluster topologies anti-scale on this host for ANY shuffling plan
(syscall-interposition contention), independent of plan quality. The
honest measurable claims for this operator on this host are:

  1. LINEARITY: wall grows ~1:1 with corpus size at fixed cores (no
     superlinear term — the join output is candidate-restricted and the
     band table is O(|docs| x n_bands)).
  2. DECOMPOSITION: the embarrassingly-parallel map side (shingle+md5
     over batch text) dominates; the shuffled band join is a small
     fraction. Map-side work scales with executors trivially; the
     shuffle it feeds is narrow 3-column rows, a fraction of input
     bytes (reported here), so at cluster scale the op inherits the
     scaling ceiling of any hash join on uniform md5 keys — no skew,
     no broadcast, no per-entity quadratic term.

Corpus: one doc per transcript turn (doc_id = xxhash64(conv_id,
turn_idx)); ~5% of docs clone the previous turn's text so the batch
genuinely matches the index (the synthetic text is otherwise unique per
turn and would make the join output empty). Even-parity doc_ids play
the already-indexed corpus — the index (minhash_band_buckets output) is
materialized to parquet UNTIMED, exactly like production where it is
paid once at corpus-dedup time; the TIMED job is batch shingling + the
index join, the per-ingest cost.

Usage: python tools/bench_dedup_inc.py [--n-convs 100000 400000]
Prints one JSON line per scale plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark import caching
from amazon_security_lake_transformation_library_spark.operators import dedup as dd
from amazon_security_lake_transformation_library_spark.session import get_spark


def _probe() -> dict:
    from membw_probe import aggregate_gbps

    return {"membw_p4_gbps": round(aggregate_gbps(4, 128, 2), 1),
            "membw_p16_gbps": round(aggregate_gbps(16, 128, 2), 1)}


def build_corpus(spark, n_convs: int, root: str) -> tuple[str, str]:
    """Materialize (index.parquet, batch.parquet) for a corpus size;
    cached across runs like the lakehouse tables they stand in for."""
    from amazon_security_lake_transformation_library_spark.synth.transcripts import (
        gen_transcripts, write_parquet,
    )

    d = os.path.join(root, f"dedupinc_{n_convs}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        write_parquet(
            gen_transcripts(n_convs=n_convs, mean_turns=20, hot_frac=0.0),
            os.path.join(d, "t.parquet"),
        )
        t = spark.read.parquet(os.path.join(d, "t.parquet"))
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        h = F.xxhash64("conv_id", "turn_idx")
        # The synthetic turn text draws from a ~30-word vocabulary, so
        # raw turns are DEGENERATELY self-similar: nearly every 3-gram
        # shingle is shared corpus-wide and LSH match count grows
        # quadratically with corpus size — an artifact of the fixture,
        # not of the operator. Interleave 8 unique-per-doc hex tokens
        # (md5 of the doc id, split every 4 chars) between the natural
        # tokens so shingle sets behave like a real heterogeneous
        # corpus; the ~5% clone injection below still duplicates FULL
        # texts, so the join finds genuine dups and only those.
        toks = F.split(F.col("text"), " ")
        m8 = F.substring(F.md5(h.cast("string")), 1, 8)
        # one unique token BETWEEN every pair of natural tokens (derived
        # from the doc hash + position, so it covers the full length):
        # every 3-gram shingle then contains >=1 doc-unique token and
        # only exact clones share shingles
        uniq = F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.concat(m8, i.cast("string")),
        )
        mixed = F.array_join(
            F.zip_with(toks, uniq, lambda a, b: F.concat_ws(" ", a, b)),
            " ",
        )
        base = t.select("conv_id", "turn_idx", mixed.alias("text"))
        # clone condition must be INDEPENDENT of the index/batch parity
        # split below: pmod(h, 20) == 0 implies h is even, which would
        # put every injected clone on the index side and never exercise
        # the duplicate-arrives-in-the-batch direction the operator
        # exists for — rehash before the modulus to decorrelate
        docs = base.select(
            h.alias("doc_id"),
            F.when(
                F.pmod(F.xxhash64(h), F.lit(20)) == 0,
                F.coalesce(F.lag("text").over(w), F.col("text")),
            ).otherwise(F.col("text")).alias("text"),
        )
        docs.filter(F.pmod("doc_id", F.lit(2)) != 0).write.mode(
            "overwrite").parquet(os.path.join(d, "batch.parquet"))
        dd.minhash_band_buckets(
            docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
        ).write.mode("overwrite").parquet(os.path.join(d, "index.parquet"))
        open(os.path.join(d, "_DONE"), "w").write("ok")
    return os.path.join(d, "index.parquet"), os.path.join(d, "batch.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, nargs="+",
                    default=[100_000, 400_000])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--root", default="/dev/shm")
    args = ap.parse_args()

    spark = get_spark("dedupinc", master="local[32]",
                      shuffle_partitions=64)
    print(json.dumps({"probe_before": _probe()}), flush=True)

    rows = []
    for n in args.n_convs:
        idx_p, batch_p = build_corpus(spark, n, args.root)
        idx = spark.read.parquet(idx_p)
        batch = spark.read.parquet(batch_p)
        n_batch, n_index_rows = batch.count(), idx.count()

        def timed(make_df):
            best = float("inf")
            for _ in range(args.runs):
                df = make_df()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                caching.release_all()
            return round(best, 2)

        # decomposition: map side alone (shingle+md5+band over the
        # batch) vs the full job (map side + shuffled index join)
        t_map = timed(lambda: dd.minhash_band_buckets(batch))
        t_full = timed(lambda: dd.dedup_incremental(idx, batch))
        n_matches = dd.dedup_incremental(idx, batch).count()
        caching.release_all()
        row = {
            "n_docs_batch": n_batch, "n_index_rows": n_index_rows,
            "map_side_s": t_map, "full_s": t_full,
            "join_overhead_s": round(t_full - t_map, 2),
            "us_per_batch_doc": round(1e6 * t_full / n_batch, 2),
            "matches": n_matches,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        scale = b["n_docs_batch"] / a["n_docs_batch"]
        print(json.dumps({
            "probe_after": _probe(),
            "input_scale_x": round(scale, 2),
            "wall_scale_x": round(b["full_s"] / a["full_s"], 2),
            "linearity": round(
                (b["full_s"] / a["full_s"]) / scale, 3),
            "map_fraction": [round(r["map_side_s"] / r["full_s"], 3)
                             for r in rows],
        }), flush=True)


if __name__ == "__main__":
    main()
