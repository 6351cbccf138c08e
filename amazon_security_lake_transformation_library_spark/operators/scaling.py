"""Leakage-safe numeric feature scaling: fit on train, transform all.

The reference library stops at schema normalization (SURVEY.md §2.A —
`transformation_function/app.py` emits OCSF rows and has no model-
feature surface); these are the numeric conditioning passes a feature
platform runs between the normalized table and the trainer, with the
same zero-lookahead contract the engine's as-of joins enforce:

- :func:`temporal_cutoff` — the train/serve boundary as a 1-row
  DataFrame (exact quantile of event time), so "fit on the past"
  needs no driver round-trip: the boundary broadcasts into the tag.
- :func:`fit_scaler_stats` — ONE aggregate pass over the training
  slice producing every statistic the transform family needs (mean,
  sample std, min/max, winsor quantiles, equi-depth bin boundaries).
  At 100 TB this is one partial-aggregated scan that reduces to a
  single row; nothing else shuffles.
- :func:`apply_scalers` — broadcast the 1-row stats frame and emit
  standard / min-max / robust (median-IQR) / winsorized values plus an
  equi-depth bin, all as JVM column expressions (whole-stage codegen,
  zero Python, zero shuffle — a pure map over the corpus).

Scale notes: the corpus is scanned three times (ts-only for the
cutoff, ts+value for the fit, full width for the transform — each
scan column-pruned to exactly what it needs) and shuffled never. The stats frame is one row; the bin
assignment reuses curriculum_buckets' filter-size trick over a
broadcast boundary array. Exact ``percentile`` is a sort-based agg —
for a 100 TB fit pass swap in ``approx_percentile`` (same call shape);
the exact form is kept as the oracle-matched default because DuckDB's
``quantile_cont`` shares its linear interpolation.

Degenerate guards, fixed rather than propagated as NULL/inf:
``std == 0`` -> 0.0, ``max == min`` -> 0.0, ``iqr == 0`` -> 0.0; NULL
inputs scale to NULL and bin to NULL (never bucket 0 — the
curriculum_buckets null-score lesson from round-4 ADVICE).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "temporal_cutoff",
    "fit_scaler_stats",
    "apply_scalers",
    "fit_transform_temporal",
    "fit_scaler_stats_grouped",
    "apply_scalers_grouped",
]


def temporal_cutoff(df: DataFrame, ts_col: str, frac: float) -> DataFrame:
    """1-row frame holding the exact ``frac`` quantile of ``ts_col``
    (epoch microseconds, as double) under the name ``cutoff_us``.

    Broadcast-join this against the corpus to tag ``is_train`` without
    collecting anything to the driver — the boundary stays in the plan.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
    return df.agg(F.percentile(us, F.lit(float(frac))).alias("cutoff_us"))


def fit_scaler_stats(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    bin_quantiles: Sequence[float] = (0.25, 0.50, 0.75),
) -> DataFrame:
    """ONE aggregate pass over ``df`` (the training slice — filter it
    BEFORE calling; the function never sees serve rows) returning a
    single row::

        mean, std (sample), vmin, vmax, p_lo, p_hi, q1 (25%), med, q3
        (75%), bin_bounds array<double>

    NULLs in ``value_col`` are ignored by every aggregate (Spark and
    ANSI SQL agree on null-skipping aggregates, so the DuckDB oracle is
    exact). All quantiles come from one ``percentile(v, array(...))``
    call — one sort-agg, not one per statistic.
    """
    v = F.col(value_col).cast("double")
    qs = [float(p_lo)] + [float(q) for q in bin_quantiles] + [float(p_hi)]
    # one percentile() over the distinct, sorted probe list
    probe = sorted(set(qs) | {0.25, 0.5, 0.75})
    pct = F.percentile(v, F.array(*[F.lit(q) for q in probe]))
    row = df.agg(
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        pct.alias("_q"),
    )
    idx = {q: i for i, q in enumerate(probe)}

    def at(q: float) -> Column:
        return F.col("_q").getItem(idx[float(q)])

    return row.select(
        "mean", "std", "vmin", "vmax",
        at(p_lo).alias("p_lo"),
        at(p_hi).alias("p_hi"),
        at(0.25).alias("q1"),
        at(0.5).alias("med"),
        at(0.75).alias("q3"),
        F.array(*[at(q) for q in bin_quantiles]).alias("bin_bounds"),
    )


def _safe_div(num: Column, den: Column) -> Column:
    """num/den with den NULL-or-0 -> 0.0 (constant encode, not NULL:
    a zero-variance train slice means the feature carries no signal,
    and downstream trainers prefer a constant to a hole)."""
    return F.when(den.isNull() | (den == 0.0), F.lit(0.0)).otherwise(num / den)


def apply_scalers(
    df: DataFrame,
    value_col: str,
    stats: DataFrame,
    prefix: str = "v",
) -> DataFrame:
    """Broadcast the 1-row ``stats`` frame (from :func:`fit_scaler_stats`)
    and append five columns — all JVM expressions, zero shuffle:

    - ``{p}_std``    (v - mean) / std
    - ``{p}_minmax`` (v - vmin) / (vmax - vmin)
    - ``{p}_robust`` (v - med) / (q3 - q1)
    - ``{p}_winsor`` clamp(v, p_lo, p_hi)
    - ``{p}_bin``    equi-depth bin = #(bin_bounds < v), NULL when v is

    NULL v -> NULL in every output (the when() guard keeps NULL out of
    bucket 0). The stats columns are dropped from the result.
    """
    v = F.col(value_col).cast("double")
    p = prefix
    out = df.crossJoin(F.broadcast(stats))
    bin_expr = F.when(
        v.isNotNull(),
        F.size(F.filter(F.col("bin_bounds"), lambda b: b < v)).cast("bigint"),
    )
    out = out.withColumns({
        f"{p}_std": F.when(v.isNotNull(), _safe_div(v - F.col("mean"), F.col("std"))),
        f"{p}_minmax": F.when(
            v.isNotNull(), _safe_div(v - F.col("vmin"), F.col("vmax") - F.col("vmin"))
        ),
        f"{p}_robust": F.when(
            v.isNotNull(), _safe_div(v - F.col("med"), F.col("q3") - F.col("q1"))
        ),
        f"{p}_winsor": F.when(
            v.isNotNull(), F.greatest(F.least(v, F.col("p_hi")), F.col("p_lo"))
        ),
        f"{p}_bin": bin_expr,
    })
    return out.drop(
        "mean", "std", "vmin", "vmax", "p_lo", "p_hi", "q1", "med", "q3",
        "bin_bounds",
    )


def fit_transform_temporal(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    train_frac: float = 0.8,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    bin_quantiles: Sequence[float] = (0.25, 0.50, 0.75),
    prefix: str = "v",
) -> DataFrame:
    """The composed program: temporal cutoff at ``train_frac`` of event
    time, fit on rows at-or-before the cutoff, transform EVERY row, tag
    ``is_train``. Three column-pruned corpus scans (cutoff, fit,
    transform), zero shuffles, two 1-row broadcasts. Serve-slice values
    provably never reach the fit aggregate (the train filter precedes
    it in the plan)."""
    cut = temporal_cutoff(df, ts_col, train_frac)
    us = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
    tagged = df.crossJoin(F.broadcast(cut)).withColumn(
        "is_train", us <= F.col("cutoff_us")
    ).drop("cutoff_us")
    stats = fit_scaler_stats(
        tagged.filter(F.col("is_train")), value_col,
        p_lo=p_lo, p_hi=p_hi, bin_quantiles=bin_quantiles,
    )
    return apply_scalers(tagged, value_col, stats, prefix=prefix)


def fit_scaler_stats_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Per-group scaler statistics: the :func:`fit_scaler_stats`
    aggregate keyed by ``group_col`` — one hash-aggregate (partial
    map-side combine, then a groups-sized shuffle; the sort cost of the
    exact percentiles is paid per group, inside the agg).

    At 100 TB the output is |groups| rows — a dimension table. Keep
    ``group_col`` low-cardinality (event types, domains, locales);
    per-entity scaling at 1e9 entities should use the windowed z-score
    in features.rolling_zscore instead (no dim table materializes).
    """
    v = F.col(value_col).cast("double")
    probe = sorted({float(p_lo), 0.25, 0.5, 0.75, float(p_hi)})
    pct = F.percentile(v, F.array(*[F.lit(q) for q in probe]))
    idx = {q: i for i, q in enumerate(probe)}
    row = df.groupBy(group_col).agg(
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        pct.alias("_q"),
    )

    def at(q: float) -> Column:
        return F.col("_q").getItem(idx[float(q)])

    return row.select(
        group_col, "mean", "std", "vmin", "vmax",
        at(p_lo).alias("p_lo"), at(p_hi).alias("p_hi"),
        at(0.25).alias("q1"), at(0.5).alias("med"), at(0.75).alias("q3"),
    )


def apply_scalers_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    stats: DataFrame,
    prefix: str = "v",
) -> DataFrame:
    """Broadcast-join the |groups|-row ``stats`` frame on ``group_col``
    and emit the same standard/min-max/robust/winsor family as
    :func:`apply_scalers`, per group. A LEFT join: rows whose group has
    no fit row (unseen at fit time) scale to NULL — never silently to a
    global statistic. The corpus does not shuffle (broadcast hash join)."""
    v = F.col(value_col).cast("double")
    p = prefix
    out = df.join(F.broadcast(stats), on=group_col, how="left")
    out = out.withColumns({
        f"{p}_std": F.when(
            v.isNotNull() & F.col("mean").isNotNull(),
            _safe_div(v - F.col("mean"), F.col("std")),
        ),
        f"{p}_minmax": F.when(
            v.isNotNull() & F.col("vmin").isNotNull(),
            _safe_div(v - F.col("vmin"), F.col("vmax") - F.col("vmin")),
        ),
        f"{p}_robust": F.when(
            v.isNotNull() & F.col("med").isNotNull(),
            _safe_div(v - F.col("med"), F.col("q3") - F.col("q1")),
        ),
        f"{p}_winsor": F.when(
            v.isNotNull() & F.col("p_lo").isNotNull(),
            F.greatest(F.least(v, F.col("p_hi")), F.col("p_lo")),
        ),
    })
    return out.drop(
        "mean", "std", "vmin", "vmax", "p_lo", "p_hi", "q1", "med", "q3"
    )
