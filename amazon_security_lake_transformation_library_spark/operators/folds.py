"""Cross-validation fold assignment — deterministic, leakage-safe,
engine-portable.

Three fold shapes a feature-engineering pipeline needs:

* ``kfold_assign`` — hash k-fold at ENTITY granularity (pass the row id
  for plain k-fold, a conversation/user id for GROUPED k-fold: every
  row of an entity lands in one fold, the property that stops
  cross-fold leakage through shared context — Kohavi 1995 / sklearn
  GroupKFold semantics, re-expressed as a pure hash projection).
* ``tscv_segment`` — expanding-window time-series CV (sklearn
  TimeSeriesSplit semantics): rows are cut into ``n_splits + 1``
  equal-frequency time segments; split ``i`` (1-based) trains on
  segments ``< i`` and tests on segment ``i``. Returned compactly as
  one ``segment`` column — the (train, test) masks for every split are
  pure comparisons against it, so no row is duplicated n_splits times.
* ``tscv_folds`` — the exploded (split_id, role) view over
  ``tscv_segment`` for consumers that want one row per (row, split).

Scale shape: ``kfold_assign`` is a narrow md5 projection (pipelines
inside the scan at 100 TB — identical cost law to datasetops.
split_assign). ``tscv_segment`` is ONE scalar percentile aggregate
(n_splits boundary values) broadcast back — the corpus never
shuffles. ``tscv_folds`` explodes at most ``n_splits`` rows per input
row and should be consumed as a view, not materialized.

Reference parity: the reference library has no dataset-split surface;
this extends the training-pipeline family (SURVEY.md §2.D).

Determinism contract: fold = ``int(md5(salt||entity)[:8], 16) % k`` is
reproducible on any engine with md5 + hex parse (DuckDB:
``('0x' || substr(md5(...), 1, 8))::BIGINT % k``); time boundaries are
interpolated percentiles ROUNDED to 4 decimal seconds before the
comparison, the same edge-stability contract curriculum bucketing uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fold_of",
    "kfold_assign",
    "tscv_segment",
    "tscv_folds",
]


def fold_of(entity: Column, k: int, salt: str) -> Column:
    """``int(md5(salt || entity)[:8], 16) % k`` as a long column.
    ``entity`` must already be a string (cast upstream, so the hashed
    byte representation is explicit and matches the oracle)."""
    h = F.substring(F.md5(F.concat(F.lit(salt), entity)), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % k).alias("fold")


def kfold_assign(
    df: DataFrame,
    entity_col: str,
    k: int = 5,
    salt: str = "kfold-v1",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic (grouped) k-fold: every row whose ``entity_col``
    hashes alike gets the same fold in ``0..k-1``. Changing ``salt``
    re-rolls; row order, partitioning and cluster size cannot. The
    32-bit hash's mod-k bias is < 2**-26 for any k < 1000 — far below
    fold-size noise at any real corpus size."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        out_col, fold_of(F.col(entity_col).cast("string"), k, salt)
    )


def tscv_segment(
    df: DataFrame,
    ts_col: str,
    n_splits: int = 4,
    out_col: str = "segment",
) -> DataFrame:
    """Expanding-window time-series CV segments: equal-frequency time
    boundaries at quantiles ``i / (n_splits + 1)``; ``segment`` = number
    of boundaries strictly below the row's timestamp (0 = the oldest
    slice, only ever train; s >= 1 = the test slice of split s).

    One scalar percentile aggregate + broadcast — zero corpus shuffle.
    Boundaries are rounded to 4 decimal seconds before comparison so the
    discrete segment decision is stable across engines (interpolated
    percentiles agree to ~1 ulp; the round collapses that)."""
    if n_splits < 1:
        raise ValueError("n_splits must be >= 1")
    # cast("timestamp") first: parquet NTZ timestamps reject unix_micros.
    # bounds come from a fresh PROJECTED lineage (select before agg) —
    # aggregating the input frame directly and cross-joining it back can
    # hit a Catalyst self-lineage bind failure downstream.
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 1)]
    bounds = df.select(sec.alias("__sec")).agg(
        F.transform(
            F.percentile(F.col("__sec"), F.array(*[F.lit(q) for q in qs])),
            lambda b: F.round(b, 4),
        ).alias("__bnds")
    )
    return (
        df.withColumn("__sec", sec)
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.size(F.filter("__bnds", lambda b: b < F.col("__sec")))
            .cast("long"),
        )
        .drop("__bnds", "__sec")
    )


def tscv_folds(
    df: DataFrame,
    ts_col: str,
    n_splits: int = 4,
) -> DataFrame:
    """Exploded view: one row per (input row, split) with
    ``split_id`` in ``1..n_splits`` and ``role`` in {'train','test'} —
    split i trains on segments < i and tests on segment i; rows newer
    than split i's test slice are absent from split i (never leaked).
    Output is at most ``n_splits`` rows per input row; consume as a
    view (filter on split_id) rather than materializing."""
    seg = tscv_segment(df, ts_col, n_splits)
    splits = F.sequence(F.lit(1), F.lit(n_splits))
    e = seg.withColumn("split_id", F.explode(splits))
    return (
        e.filter(F.col("segment") <= F.col("split_id"))
        .withColumn(
            "role",
            F.when(F.col("segment") == F.col("split_id"), F.lit("test"))
            .otherwise(F.lit("train")),
        )
        .drop("segment")
    )
