"""KMV (k-minimum-values) distinct-count sketch — the distributive
cardinality estimator a 100 TB pipeline uses where an exact
``count(DISTINCT x)`` would shuffle every distinct value.

Why not just count distinct? Exact distinct shuffles the full distinct
key set (at corpus scale: billions of rows through one exchange). The
KMV estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM'02) keeps only the k smallest *unique* hash values per
group: if the k-th smallest normalized hash is ``h_k``, the distinct
count is ≈ (k-1)/h_k. The sketch is distributive — per-partition k-min
sets merge by taking the k smallest of the union — so the shuffle
carries at most ``n_partitions * n_groups * k`` rows regardless of data
volume.

Shape here (Spark-first, no custom UDAF needed):

1. a JVM projection computes a [0,1) fraction from the md5 of the value
   (first 8 hex nibbles, exact binary fractions — reproducible in ANSI
   SQL, so the DuckDB differential gate can recompute it bit-for-bit);
2. ``mapInPandas`` reduces each PARTITION to its per-group k smallest
   unique fractions (bounded state: a dict of ≤ k-element arrays; Arrow
   batches in, one small batch out per partition);
3. a grouped window takes the k-th smallest distinct fraction of the
   merged candidates and applies the estimator.

Groups with fewer than k distinct hashes hold their ENTIRE hash set, so
the "estimate" is exact there (n_seen < k ⇒ estimate = n_seen) — the
standard KMV small-cardinality behavior, handled identically in the SQL
oracle.

Determinism: md5 is seedless, the fraction is a sum of exact powers of
16, and ties cannot occur between distinct hashes — the result is a pure
function of the value set, independent of partitioning (property-tested
under repartition in tests/test_sketch.py).

The reference has no aggregation surface at all; this is part of the
LLM-pipeline extension (corpus stats: distinct users/URLs/shingles per
slice without a full distinct shuffle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_frac", "kmv_distinct"]

_HEX = "0123456789abcdef"


def hash_frac(value: Column) -> Column:
    """Uniform [0,1) fraction from md5(value): sum of the first 8 hex
    nibbles weighted 16^-1 .. 16^-8. Every term is an exact binary
    fraction, so Spark and DuckDB produce bit-identical doubles. The
    8-nibble truncation leaves 2^-32 granularity — collision probability
    is negligible for the k-th-order statistic at any realistic k."""
    h = F.md5(value.cast("string"))
    out = F.lit(0.0)
    for i in range(1, 9):
        out = out + (
            (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - F.lit(1)).cast(
                "double"
            )
            * F.lit(16.0 ** -i)
        )
    return out


def _partition_kmin(k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[object, set] = {}
        for b in batches:
            for g, fr in zip(b["g"].values, b["frac"].values):
                s = state.setdefault(g, set())
                if len(s) < k:
                    s.add(fr)
                elif fr < max(s):
                    s.add(fr)
                    if len(s) > k:
                        s.discard(max(s))
        rows = [(g, fr) for g, s in state.items() for fr in s]
        if rows:
            yield pd.DataFrame(rows, columns=["g", "frac"])
        else:  # keep Arrow dtypes stable on empty partitions
            yield pd.DataFrame(
                {
                    "g": pd.Series([], dtype=object),
                    "frac": pd.Series([], dtype="float64"),
                }
            )

    return fn


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_candidates,
    estimate). ``estimate`` is rounded to 4 decimals; exact (= the number
    of distinct hashes seen) when a group has < k distinct values.

    ``n_candidates`` is the size of the merged k-min set (= k when the
    group saturates) — exposed so callers can see which groups are in
    the exact regime."""
    hashed = df.select(
        F.col(group_col).cast("string").alias("g"),
        hash_frac(F.col(value_col)).alias("frac"),
    )
    # per-partition bounded reduction: <= n_groups * k rows out per
    # partition, regardless of partition size
    candidates = hashed.mapInPandas(
        _partition_kmin(k), schema="g string, frac double"
    )
    # merge: k smallest DISTINCT fractions across partitions
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("frac")
    ranked = (
        candidates.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return (
        ranked.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(F.when(F.col("rn") == k, F.col("frac"))).alias("__hk"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            (
                F.round(
                    F.when(
                        F.col("__hk").isNotNull(),
                        (F.lit(k) - F.lit(1)) / F.col("__hk"),
                    ).otherwise(F.col("n_candidates").cast("double")),
                    4,
                )
                + F.lit(0.0)
            ).alias("estimate"),
        )
    )
