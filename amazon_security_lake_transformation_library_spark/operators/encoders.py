"""Leakage-controlled categorical encoders + distribution diagnostics.

The reference library normalizes schemas and stops (SURVEY.md §2.A —
`transformation_function/app.py` emits OCSF rows, no model features);
these are the encoding passes a feature platform runs on the normalized
table before training, each a pure DataFrame program:

- :func:`target_encode_ordered` — CatBoost-style *ordered* target
  statistics: per-category target mean computed over rows strictly in
  the past, so the encoding of a row never reads its own (or any
  future) label. The categorical counterpart of the as-of feature
  contract.
- :func:`frequency_encode` — category -> corpus count / frequency via a
  broadcast join of the (tiny) category table.
- :func:`zscore_by_group` — per-group standardization (v - mean)/std
  with broadcast group stats; std==0 groups encode to 0.0 instead of
  NULL/inf.
- :func:`mutual_information` — MI (nats) between two discrete columns
  from one contingency aggregate; the feature-selection screen.

Everything is expressible in ANSI SQL, so each operator carries an
exact DuckDB oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------- ordered target stats


def target_encode_ordered(
    df: DataFrame,
    cat_col: str,
    target: Column,
    ts_col: str,
    prior: float,
    m: float = 20.0,
    out_col: str = "te",
) -> DataFrame:
    """Ordered (time-respecting) target encoding: for each row, the
    m-smoothed mean of ``target`` over SAME-CATEGORY rows strictly
    before this row's timestamp::

        te = (sum_past(target) + m * prior) / (n_past + m)

    Rows sharing the row's exact timestamp are EXCLUDED (they are not
    information strictly before t), so the encoding provably never
    reads its own label — the categorical analogue of the engine's
    as-of zero-lookahead contract, after CatBoost's ordered target
    statistics. ``prior`` must come from outside the training window
    (a previous period, or a domain constant); computing it from this
    frame would leak the global label mean into every early row.

    Frame: ``RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` over
    integer microseconds — a running-sum frame Spark evaluates in one
    forward pass (never O(n^2) per partition), deterministic under any
    input order because RANGE frames are keyed by the ts value.

    Layout-aware ordering: an integral ``ts_col`` (epoch microseconds,
    e.g. a ``ts_us`` in the lakehouse sort key) is ordered by directly,
    so on a table bucketed by ``cat_col`` and sorted
    ``(cat_col, ts_us)`` the window plans zero Exchange and zero Sort
    (Sort elimination is syntactic; a ``unix_micros(cast(...))``
    expression would re-sort).

    Scale shape: one Exchange + sort on ``cat_col``. For a
    LOW-cardinality categorical this concentrates the corpus into
    |categories| partitions — at 100 TB route such columns through a
    coarse time-bucket pre-aggregation or use a prior-period snapshot
    encoding (``frequency_encode`` on the previous day joined
    broadcast) instead; this exact per-row form is meant for
    mid/high-cardinality keys (user ids, domains), where the partition
    count is the key count.
    """
    ts_key = (
        F.col(ts_col)
        if dict(df.dtypes).get(ts_col) in ("int", "bigint", "smallint")
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(cat_col)
        .orderBy(ts_key)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    t = target.cast("double")
    n_past = F.count(t).over(w)
    sum_past = F.coalesce(F.sum(t).over(w), F.lit(0.0))
    te = (sum_past + F.lit(float(m)) * F.lit(float(prior))) / (
        n_past + F.lit(float(m))
    )
    return df.select("*", n_past.alias(f"{out_col}_n"), te.alias(out_col))


# ------------------------------------------------------- frequency encode


def frequency_encode(
    df: DataFrame,
    cat_col: str,
    out_col: str = "freq",
) -> DataFrame:
    """Attach per-category corpus count and frequency fraction.

    Scale shape: the category table is one hash aggregate (map-side
    combine collapses the traffic to |categories| rows per task), the
    total is computed ON that table (a second tiny aggregate, never a
    second corpus pass), and the join back is an explicit broadcast —
    the corpus never shuffles. |categories| must fit in a broadcast
    (~10M rows is fine); beyond that this becomes a plain shuffle join
    on a uniform key, still one corpus pass.

    NULL categories are a group like any other (groupBy keeps the NULL
    key; the join back is null-safe), so no input row is dropped.
    """
    counts = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias(f"{out_col}_n"))
    total = counts.agg(F.sum(f"{out_col}_n").alias("_tot"))
    table = counts.crossJoin(F.broadcast(total)).select(
        F.col(cat_col).alias("_cat_key"),
        f"{out_col}_n",
        (F.col(f"{out_col}_n") / F.col("_tot")).alias(out_col),
    )
    return df.join(
        F.broadcast(table), F.col(cat_col).eqNullSafe(F.col("_cat_key"))
    ).drop("_cat_key")


# --------------------------------------------------------- group z-score


def zscore_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    out_col: str = "z",
) -> DataFrame:
    """Per-group standardization ``(v - mean_g) / std_g`` (population
    std). Degenerate groups (std == 0, e.g. a single row) encode to
    0.0 — a constant feature, not NULL/Infinity.

    Scale shape: one hash aggregate to the group table (tiny), one
    broadcast join back — same one-corpus-pass shape as
    :func:`frequency_encode`. A window over the group key would give
    the identical result but force a full sort within each group;
    mean/std need no ordering, so the agg+join form is strictly
    cheaper and skew-immune (the agg key skews, the join side is
    broadcast). NULL groups are kept (null-safe join keys), matching
    the window-form semantics where NULL partitions together.
    """
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.avg(v).alias("_mean"),
        F.stddev_pop(v).alias("_std"),
    )
    stats = stats.select(
        *[F.col(g).alias(f"_gk_{i}") for i, g in enumerate(group_cols)],
        "_mean",
        "_std",
    )
    cond = None
    for i, g in enumerate(group_cols):
        c = F.col(g).eqNullSafe(F.col(f"_gk_{i}"))
        cond = c if cond is None else cond & c
    z = F.when(F.col("_std") == 0.0, F.lit(0.0)).otherwise(
        (v - F.col("_mean")) / F.col("_std")
    )
    return (
        df.join(F.broadcast(stats), cond)
        .select(*df.columns, z.alias(out_col))
    )


# ------------------------------------------------------ mutual information


def mutual_information(
    df: DataFrame,
    x: Column,
    y: Column,
    out_col: str = "mi",
) -> DataFrame:
    """Mutual information (nats) between two discrete expressions:
    ``MI = sum_{x,y} p(x,y) * ln(p(x,y) / (p(x) p(y)))`` over observed
    cells. Returns a 1-row DataFrame — the screening score of a
    feature-selection pass (MI of each candidate feature against the
    label; 0 = independent).

    Scale shape: ONE corpus aggregate to the contingency table
    (|X| x |Y| cells, map-side combined); the marginals and the MI sum
    are windows/aggregates over that tiny table. The corpus crosses
    the wire once, keyed by the (x, y) cell — if a single cell
    dominates, map-side combine already collapsed it per-task.
    """
    cells = df.select(x.alias("_x"), y.alias("_y")).groupBy("_x", "_y").agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    wx = Window.partitionBy("_x")  # contingency table only
    wy = Window.partitionBy("_y")
    wall = Window.partitionBy()
    tot = F.sum("_n").over(wall)
    p_xy = F.col("_n") / tot
    p_x = F.sum("_n").over(wx) / tot
    p_y = F.sum("_n").over(wy) / tot
    return cells.select(
        (p_xy * F.log(p_xy / (p_x * p_y))).alias("_term")
    ).agg(F.sum("_term").alias(out_col))


def quantile_bin_encode(
    df: DataFrame,
    value_col: str,
    split_col: str,
    n_bins: int = 5,
    base_split: str = "train",
    out_col: str = "qbin",
) -> DataFrame:
    """Equal-frequency (quantile) discretization with a LEAKAGE-SAFE
    fit: bin boundaries are the interior quantiles of ``value_col``
    computed over ``base_split`` rows ONLY, then applied to every row —
    the standard discipline for binning a feature that will be
    target-encoded or fed to a tree model (fitting on val/test rows
    leaks their distribution into the transform).

    Bin of a row = number of boundaries strictly below its value
    (boundaries rounded to 4 dp so the edge comparison is reproducible
    across engines — the folds.py time-series-CV convention), i.e.
    bin 0 holds values up to the first quantile, bin n_bins-1 above the
    last.

    Scale shape: ONE exact-percentile aggregate over the train slice
    (n_bins-1 doubles on the driver plan as a broadcast literal array),
    then a pure in-row projection — the corpus itself is never
    shuffled, exactly the PSI/temporal-scaling pattern.
    """
    v = F.col(value_col).cast("double")
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = (
        df.where(F.col(split_col) == base_split)
        .agg(F.percentile(v, F.lit(qs)).alias("_b"))
        .select(F.transform("_b", lambda b: F.round(b, 4)).alias("_b"))
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.size(F.filter("_b", lambda b: b < v)).cast("int"),
        )
        .drop("_b")
    )
