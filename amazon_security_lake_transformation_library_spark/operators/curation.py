"""Dataset-curation operators for LLM training pipelines.

The reference library stops at schema normalization (SURVEY.md §2.A —
`transformation_function/app.py` has no labeling, sampling, or corpus
statistics at all); these are the curation passes a training-data
pipeline runs AFTER normalization, each expressed as pure DataFrame ops
so Catalyst keeps them inside the scan/shuffle stages it already plans:

- :func:`label_horizon` — forward-looking label join ("did the entity do
  X within the next H seconds"), the leakage-controlled counterpart of
  the as-of features (features look strictly backward, labels strictly
  forward).
- :func:`sample_topn_per_group` — deterministic per-group top-N
  subsample by salted hash rank (rank-limit pushes down to a
  WindowGroupLimit, so each map task keeps only N rows per group before
  the shuffle).
- :func:`domain_mixture` — α-smoothed domain sampling weights + epoch
  counts (the data-mixing table of a pretraining run).
- :func:`importance_weights` — DSIR-style hashed n-gram importance
  scores log p_target(g)/p_raw(g) averaged per document.
- :func:`psi_by_split` — population-stability-index drift check between
  the train split and every other split (train/serve skew detection).

All hashing is md5-prefix based (the repo-wide engine-portable idiom,
see datasetops.hash_bucket4) so every operator has an exact DuckDB
oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------- forward labels


def label_horizon(
    df: DataFrame,
    entity: str,
    ts_col: str,
    target: Column,
    horizon_seconds: float,
    label_col: str = "label",
) -> DataFrame:
    """Forward-horizon label: for each row, does ``target`` fire for the
    same entity within the next ``horizon_seconds`` (exclusive of the
    current timestamp's peers)?

    This is the labeling half of a point-in-time training set: features
    read rows with ts <= t (the as-of contract, zero lookahead), labels
    read rows with ts strictly > t — the one place lookahead is ALLOWED,
    and keeping it in a separate operator makes the leakage boundary
    auditable (no feature column can be built from this output without
    the `label_` prefix showing up in lineage).

    Frame: ``RANGE BETWEEN 1 FOLLOWING AND H FOLLOWING`` over integer
    microseconds — equal-ts peers are EXCLUDED from their own label
    (they are information at time t, not after it), exact integer
    boundaries (no float rounding at the frame edge).

    Scale shape: one Exchange on the entity key + one time sort shared
    by both outputs (single Window operator); the frame is a sliding
    two-pointer pass — never a self-join. At 100 TB this rides the same
    conv_id/user_id partitioning every other feature window uses.

    Layout-aware ordering: if ``ts_col`` is already an integral column
    (epoch MICROSECONDS, e.g. a ``ts_us`` materialized into the
    lakehouse layout's sort key), the window orders by the column
    itself instead of a ``unix_micros(cast(...))`` expression. Sort
    elimination against a bucketed-sorted scan is SYNTACTIC — an
    order-isomorphic expression still plans a Sort — so on a table
    bucketed by entity and sorted ``(entity, ts_us)`` this path plans
    ZERO Exchange and ZERO Sort (pinned in test_plans_quality).
    """
    ts_key = (
        F.col(ts_col)
        if dict(df.dtypes).get(ts_col) in ("int", "bigint", "smallint")
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(entity)
        .orderBy(ts_key)
        .rangeBetween(1, int(horizon_seconds * 1_000_000))
    )
    n = F.count(F.when(target, F.lit(1))).over(w)
    return df.select(
        "*",
        n.alias(f"{label_col}_n"),
        (n > 0).alias(label_col),
    )


# -------------------------------------------- deterministic group sampling


def sample_topn_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
    salt: str = "topn-v1",
) -> DataFrame:
    """Keep a deterministic pseudo-random N rows per group: rank rows
    inside each group by ``md5(salt || id)`` (id as tiebreak) and keep
    rank <= n. Unlike ``sample_stratified`` (per-row Bernoulli, output
    size binomial) this gives EXACTLY min(n, |group|) rows per group —
    the "N examples per domain" cap of a curriculum builder — and is
    reproducible under any partitioning or cluster size (the only
    input is the salted hash).

    Scale shape: rank-limit pushdown — Catalyst rewrites the
    row_number+filter into a WindowGroupLimit that runs BEFORE the
    exchange, so each map task forwards at most n rows per group and
    the shuffle carries O(groups x n), not the corpus
    (test_curation pins the WindowGroupLimit node).
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n: int,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, probability proportional
    to ``weight``: Efraimidis-Spirakis exponential keys. Each row draws
    a deterministic uniform u from ``md5(salt || id)`` and is ranked by
    ``-ln(u) / w`` ascending (equivalently u^(1/w) descending); the
    bottom-n ranks are the sample. One pass, no rejection loop, exact
    sample size, and — because the only randomness is the salted hash —
    reproducible under any partitioning or cluster size, like every
    sampler in this module.

    Rows with weight <= 0 or NULL never sample — they are filtered out,
    so an under-full sample is never backfilled with zero-weight rows.
    Ties on the key break by ``id_col``.

    Scale shape: global top-n is a ``TakeOrderedAndProject`` — every
    map task keeps an n-row heap, the driver merges W heaps; nothing
    resembling a corpus sort or shuffle happens (the classic
    distributed weighted-reservoir construction). The key column is
    exposed so the selection is auditable. The uniform reuses
    sketch.hash_frac's exact-binary-fraction construction, so the key
    is bit-identical in any engine (the 2^-32 guard term dodges
    ln(0) at u=0 without breaking that exactness).
    """
    from amazon_security_lake_transformation_library_spark.operators.sketch import hash_frac

    u = hash_frac(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    wgt = weight.cast("double")
    key = -F.log(u + F.lit(2.0**-33)) / wgt
    return (
        df.filter(wgt > 0.0)  # weight<=0/NULL never samples (not even to
        .select("*", key.alias("es_key"))  # backfill an under-full n)
        .orderBy("es_key", id_col)
        .limit(n)
    )


# ------------------------------------------------------- domain mixing


def domain_mixture(
    df: DataFrame,
    domain_cols: list[str],
    size_col: Column,
    alpha: float = 0.3,
    target_size: float | None = None,
) -> DataFrame:
    """Per-domain α-smoothed sampling weights (the pretraining data-mixing
    table): ``weight_d = size_d^alpha / sum_d' size_d'^alpha``. alpha=1
    is proportional sampling, alpha=0 uniform over domains; 0.2-0.5 is
    the standard unimax-style flattening that keeps small domains from
    vanishing. If ``target_size`` is given, also emits ``epochs`` — how
    many passes over domain d a ``target_size``-sized run makes
    (epochs >> 1 flags domains the mixture would over-repeat).

    Scale shape: one hash aggregate over the corpus (partial map-side
    combine, tiny output — one row per domain), then the normalization
    window runs on the DOMAIN table (dozens of rows), where a
    single-partition window is free. Nothing corpus-sized crosses the
    second stage.
    """
    per = df.groupBy(*domain_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size_col).cast("double").alias("size"),
    )
    w = Window.partitionBy()  # domain table only — never corpus-sized
    raw = F.pow(F.col("size"), F.lit(float(alpha)))
    out = per.withColumn("weight", raw / F.sum(raw).over(w))
    if target_size is not None:
        out = out.withColumn(
            "epochs", F.lit(float(target_size)) * F.col("weight") / F.col("size")
        )
    return out


# ------------------------------------- hashed n-gram importance (DSIR-ish)


def hashed_bigram_buckets(text: Column, n_buckets: int = 4096) -> Column:
    """array<int> of hashed word-bigram buckets for one document: bucket =
    (first 16 bits of md5(bigram)) mod n_buckets. In-row projection —
    no explode, no shuffle.

    Built as ``zip_with(words[:-1], words[1:])`` rather than
    ``transform(..., element_at(words, i+2))``: a non-lambda-dependent
    subtree referenced INSIDE a higher-order-function lambda is
    re-evaluated per element (Spark's subexpression elimination does not
    hoist across lambdas), so the element_at form re-ran the regex
    split once per word — O(words^2) tokenization per document. The
    zip_with form evaluates the split a constant number of times per
    row."""
    words = F.split(F.trim(text), r"\s+")
    n1 = F.greatest(F.size(words) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(words, 1, n1),
        F.slice(words, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 4), 16, 10).cast("int")
            % F.lit(n_buckets)
        ),
    )


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance score per document: average over the doc's
    hashed word bigrams g of ``ln p_target(g) - ln p_raw(g)``, where
    p_target is the bucket distribution of the rows matching ``target``
    (the in-domain exemplar set) and p_raw of the whole corpus, both
    Laplace-smoothed with ``alpha``. Rank by score, keep the top slice
    -> a corpus re-weighted toward the target domain using only hashed
    n-gram statistics (no model), after Xie et al.'s data-selection-
    with-importance-resampling recipe.

    Scale shape, 100 TB reading: (1) one explode + hash aggregate keyed
    on the UNIFORM bucket id produces the count table — map-side
    combine collapses each task's grams to <= n_buckets cells, so the
    only Exchange carries O(tasks x n_buckets) rows, not the corpus;
    (2) the n_buckets-row count table is collected (a k-row driver
    round-trip, same budget class as the k-means centroid tables) and
    folded into a constant log-weight array; (3) the per-doc score is
    then a pure IN-ROW fold — hash the grams again, look each bucket up
    in the literal array, average — so the scoring pass has ZERO
    shuffle and the corpus never crosses the wire at all. (An earlier
    form broadcast-joined the exploded gram table and re-aggregated by
    doc_id, which shuffled one row per gram — corpus-word-sized — for a
    result that is per-doc; the literal-array fold removes that whole
    Exchange.) Eager: calling this runs the stage-1 count job.
    """
    buckets = hashed_bigram_buckets(F.col(text_col), n_buckets)
    # >= 2 words <=> >= 1 bigram; filtering on the word count instead of
    # size(_buckets) keeps the Filter from re-evaluating the whole gram
    # hash tree a second time before the Project
    docs = df.filter(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) > 1
    ).select(
        F.col(id_col),
        target.cast("int").alias("_is_target"),
        buckets.alias("_buckets"),
    )
    rows = (
        docs.select(F.col("_is_target"), F.explode("_buckets").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum("_is_target").alias("n_target"),
        )
        .collect()
    )
    n_raw = [0.0] * n_buckets
    n_target = [0.0] * n_buckets
    for r in rows:
        n_raw[r["bucket"]] = float(r["n_raw"])
        n_target[r["bucket"]] = float(r["n_target"])
    tot_raw, tot_target = sum(n_raw), sum(n_target)
    a = float(alpha)
    ab = a * n_buckets
    log_w = [
        math.log((n_target[i] + a) / (tot_target + ab))
        - math.log((n_raw[i] + a) / (tot_raw + ab))
        for i in range(n_buckets)
    ]
    arr = F.lit(log_w)  # constant-folded to one array literal
    score = F.aggregate(
        F.transform(F.col("_buckets"), lambda b: F.element_at(arr, b + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("_buckets")
    return docs.select(F.col(id_col), score.alias("importance"))


# --------------------------------------------------------- drift / PSI


def psi_by_split(
    df: DataFrame,
    split_col: str,
    value_col: str,
    n_bins: int = 10,
    base_split: str = "train",
    eps: float = 1e-4,
) -> DataFrame:
    """Population stability index of ``value_col`` between ``base_split``
    and every other split label: ``PSI = sum_bins (p - q) * ln(p/q)``
    over ``n_bins`` equal-width bins spanning the GLOBAL min/max (shared
    bins are the PSI contract; per-split bins would hide the very shift
    being measured). ``eps``-smoothing keeps empty bins finite. PSI <
    0.1 is conventionally "no shift"; this is the train/serve-skew gate
    a feature platform runs before promoting a training set.

    Scale shape: one min/max aggregate (2 scalars, broadcast back via a
    literal-free cross join of a 1-row frame), one (split, bin) hash
    aggregate — output n_splits x n_bins rows; every later step runs on
    that tiny table. Two corpus passes total, no corpus-sized shuffle
    (the (split,bin) key space is ~dozens, map-side combine collapses
    the traffic).
    """
    bounds = df.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )
    v = F.col(value_col).cast("double")
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    # degenerate range (hi == lo) -> everything in bin 0, not a 0/0 NaN
    bin_expr = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_lo")) / width).cast("int"),
            F.lit(n_bins - 1),
        )
    )
    binned = df.crossJoin(F.broadcast(bounds)).select(
        F.col(split_col).alias("split"), bin_expr.alias("bin")
    )
    per = binned.groupBy("split", "bin").agg(F.count(F.lit(1)).alias("n"))
    sw = Window.partitionBy("split")  # (split,bin) table only
    frac = per.select(
        "split",
        "bin",
        (F.col("n") / F.sum("n").over(sw)).alias("frac"),
    )
    # full (split x bin) grid: a bin that one side leaves EMPTY still
    # contributes (eps-smoothed) — that one-sided mass is exactly the
    # drift signal PSI exists to catch
    splits = frac.select("split").distinct().filter(F.col("split") != base_split)
    grid = splits.crossJoin(
        F.broadcast(
            frac.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
        )
    )
    base = frac.filter(F.col("split") == base_split).select(
        "bin", F.col("frac").alias("p")
    )
    other = frac.filter(F.col("split") != base_split).withColumnRenamed("frac", "q")
    e = F.lit(float(eps))
    pj = F.coalesce(F.col("p"), F.lit(0.0)) + e
    qj = F.coalesce(F.col("q"), F.lit(0.0)) + e
    return (
        grid.join(F.broadcast(base), "bin", "left")
        .join(other, ["split", "bin"], "left")
        .groupBy("split")
        .agg(F.sum((pj - qj) * F.log(pj / qj)).alias("psi"))
    )


# ------------------------------------------------------ curriculum order


def curriculum_buckets(
    docs: DataFrame,
    score: Column | None = None,
    n_buckets: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum ordering: assign every document an easy->hard bucket by
    exact score quantile, plus a deterministic within-bucket shuffle key
    — the two sort columns a curriculum-scheduled training read orders
    by (``ORDER BY bucket, order_key``). Emitting sort KEYS instead of a
    globally sorted table keeps the operator shuffle-free; the global
    sort is the reader's range partition, paid once at read time.

    ``score`` defaults to ``n_chars`` (document length — the classic
    length-based curriculum); pass any difficulty Column (loss proxy,
    quality score). Buckets split at the exact ``i/n_buckets``
    percentiles (``F.percentile`` — one aggregate; its partials merge
    map-side, so the corpus never shuffles), ROUNDED to 4 decimals
    before comparison: interpolated quantiles differ in final ulps
    across engines, and the round makes bucket assignment reproducible
    bit-for-bit everywhere (the same contract doc_length_quantiles
    pins). Bucket = count of boundaries strictly below the score, so
    scores exactly on a boundary go DOWN (first bucket whose range
    contains them); ``order_key`` = md5 of the id — deterministic under
    any partitioning, uncorrelated with the score. A NULL/NaN score
    yields a NULL bucket (surfaced, not silently binned: a null
    predicate inside ``F.filter`` drops every element, which would
    otherwise land null-difficulty docs in the easiest bucket).

    Shape: one scalar aggregate -> broadcast (a 1-row array) -> in-row
    projection. Zero data shuffle at any corpus size.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    s = (score if score is not None else F.col("n_chars")).cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # NaN must be masked to NULL BEFORE the percentile aggregate, not just
    # at assignment time: F.percentile skips NULLs but ranks NaN above
    # every double, so >q% NaN scores would push the upper boundaries to
    # NaN and make the top buckets unreachable for every real score
    # (NaN-vs-x comparisons are false, so "b < score" never admits them).
    bounds = docs.select(
        F.when(~F.isnan(s), s).alias("__s")
    ).agg(
        F.transform(
            F.percentile(F.col("__s"), F.array(*[F.lit(q) for q in qs])),
            lambda b: F.round(b, 4),
        ).alias("__bnds")
    )
    x = docs.select(id_col, s.alias("score")).crossJoin(F.broadcast(bounds))
    return x.select(
        id_col,
        "score",
        F.when(
            F.col("score").isNotNull() & ~F.isnan("score"),
            F.size(F.filter("__bnds", lambda b: b < F.col("score"))),
        ).cast("long").alias("bucket"),
        F.md5(F.col(id_col).cast("string")).alias("order_key"),
    )


# -------------------------------------------------- contrastive negatives


def negative_samples(
    docs: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic contrastive negative sampling: each anchor document
    gets its ``k`` successors on a salted md5 hash ring as negatives —
    pseudo-random pairings (the ring order is uncorrelated with any
    content ordering) that are REPRODUCIBLE across runs, partitionings
    and engines, which in-batch or rand()-based negatives are not.

    The ring is bucketed (first 16 md5 bits mod ``n_buckets``) so rank
    assignment parallelizes: within each bucket, documents rank by
    ``(ring_hash, id)``; anchor ``r`` takes ranks ``(r-1+i) mod cnt + 1``
    for ``i = 1..k`` (cyclic — tail anchors wrap to the bucket head).
    Singleton buckets yield no negatives (the only candidate is the
    anchor itself); buckets with ``cnt <= k`` yield exactly ``cnt-1``
    distinct negatives (``neg_rank`` is capped at ``cnt-1``, so cycling
    can neither revisit a negative nor land back on the anchor).
    Change ``salt`` to draw an independent negative set per epoch.

    Returns ``(id_col, neg_rank, neg_id)``. Shape: one bucket-keyed
    window, an in-row ``sequence(1..k)`` explode, and one skinny
    self-equi-join on ``(bucket, rank)`` — every shuffled row is three
    ints and a hash, never document payloads; join negatives back to
    content by id downstream.
    """
    if k < 1:
        # F.sequence(1, 0) would count DOWN ([1, 0]) and emit a bogus
        # negative per anchor — reject rather than mean "no negatives"
        raise ValueError("k must be >= 1")
    ring = F.md5(
        F.concat(F.lit(salt), F.lit("\x1f"), F.col(id_col).cast("string"))
    )
    bucket = (
        F.conv(F.substring(ring, 1, 4), 16, 10).cast("int") % F.lit(n_buckets)
    )
    w = Window.partitionBy("__bkt").orderBy("__ring", id_col)
    ranked = (
        docs.select(F.col(id_col), ring.alias("__ring"), bucket.alias("__bkt"))
        .select(
            "*",
            F.row_number().over(w).alias("__rank"),
            F.count(F.lit(1)).over(Window.partitionBy("__bkt")).alias("__cnt"),
        )
    )
    pairs = ranked.select(
        F.col(id_col),
        "__bkt",
        "__rank",
        "__cnt",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
    ).filter(F.col("neg_rank") <= F.col("__cnt") - 1).withColumn(
        "__target",
        ((F.col("__rank") - 1 + F.col("neg_rank")) % F.col("__cnt")) + 1,
    )
    r2 = ranked.select(
        F.col(id_col).alias("neg_id"),
        F.col("__bkt").alias("__b2"),
        F.col("__rank").alias("__r2"),
    )
    return (
        pairs.join(
            r2,
            (F.col("__bkt") == F.col("__b2"))
            & (F.col("__target") == F.col("__r2")),
        )
        .filter(F.col("neg_id") != F.col(id_col))
        .select(id_col, "neg_rank", "neg_id")
    )


# ----------------------------------------------------- mixture execution


def materialize_mixture(
    docs: DataFrame,
    mixture: DataFrame,
    domain_cols: list[str],
    epochs_col: str = "epochs",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """EXECUTE a data-mixing table (:func:`domain_mixture` computes the
    weights; this materializes the resampled corpus): each document is
    replicated ``floor(epochs_d)`` times plus one more with probability
    ``frac(epochs_d)`` — deterministic stochastic rounding via the
    salted md5 uniform (sketch.hash_frac), so the expected per-domain
    token mass is exactly ``epochs_d x size_d`` and the realized corpus
    is reproducible under any partitioning or engine. Domains absent
    from the mixture table drop (inner join) — that IS the mixture
    saying weight 0. Change ``salt`` to redraw the fractional copies.

    Output: the input columns plus ``epoch_idx`` (0-based copy number —
    downstream shuffling should key on ``(id, epoch_idx)`` so copies
    spread across shards). Shape: one broadcast join (|domains| rows) +
    an in-row sequence/explode; the corpus crosses once, no shuffle.
    Pass ``epochs`` pre-rounded (e.g. ``F.round(.., 4)``) when the
    mixture is recomputed per engine — pow() can differ in final ulps
    and the stochastic-rounding comparison should not sit on that edge.
    """
    from .sketch import hash_frac

    j = docs.join(F.broadcast(mixture), list(domain_cols), "inner")
    ep = F.col(epochs_col)
    whole = F.floor(ep).cast("int")
    frac = ep - F.floor(ep)
    u = hash_frac(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    n = whole + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))
    seq = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return j.select("*", F.explode(seq).alias("epoch_idx"))


def ks_drift(
    df: DataFrame,
    split_col: str,
    value_col: str,
    base_split: str = "train",
    round_to: int | None = 2,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic of ``value_col``
    between ``base_split`` and every other split:
    ``KS = max_v |F_base(v) - F_other(v)|`` — the bin-free companion to
    :func:`psi_by_split` (PSI needs a bin width; KS is the sup-distance
    between the exact empirical CDFs, sensitive to shape shifts PSI's
    coarse bins can blur).

    Scale shape: the corpus collapses FIRST to a (split, distinct
    value) count table via one map-side-combined hash aggregate (bound
    the table with ``round_to`` quantization — KS over 2-dp-quantized
    values is the statistic of the quantized variable, stated
    explicitly rather than silently float-exact). Both CDFs are then
    evaluated on the UNION grid of observed values — each side's CDF
    must be carried across the other side's jump points, otherwise the
    sup lands between grid points and is undercounted — with one
    cumulative window per split over that small table, a broadcast join
    back to the base CDF, and a |splits|-row max.
    """
    from .. import caching

    v = F.col(value_col).cast("double")
    if round_to is not None:
        v = F.round(v, round_to)
    # persist_tracked: the count table is referenced by the value grid,
    # the split list, the CDF join AND the base/other CDF split — five
    # consumers that would each re-run the corpus aggregation (the plan
    # showed 12 corpus scans unpersisted). The table itself is
    # (splits x distinct quantized values)-sized, safely cacheable.
    counts = caching.persist_tracked(
        df.select(F.col(split_col).alias("split"), v.alias("v"))
        .groupBy("split", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    splits = counts.select("split").distinct()
    grid = counts.select("v").distinct().crossJoin(F.broadcast(splits))
    w = (
        Window.partitionBy("split")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("split")
    cdf = (
        grid.join(counts, ["split", "v"], "left")
        .select(
            "split",
            "v",
            (
                F.sum(F.coalesce(F.col("n"), F.lit(0))).over(w)
                / F.sum(F.coalesce(F.col("n"), F.lit(0))).over(tot)
            ).alias("cdf"),
        )
    )
    base = cdf.where(F.col("split") == base_split).select(
        "v", F.col("cdf").alias("cdf_base")
    )
    return (
        cdf.where(F.col("split") != base_split)
        .join(F.broadcast(base), "v")
        .groupBy("split")
        .agg(
            (F.round(F.max(F.abs(F.col("cdf") - F.col("cdf_base"))), 4)
             + F.lit(0.0)).alias("ks")
        )
    )


def select_until_budget(
    df: DataFrame,
    score_col: str = "score",
    cost_col: str = "cost",
    budget: float = 1_000_000.0,
    id_col: str = "doc_id",
    n_buckets: int = 100_000,
) -> DataFrame:
    """Budget-capped greedy selection: take rows in ``(score DESC,
    id ASC)`` order while the running ``cost`` total stays <= ``budget``
    — "best documents until the token budget is spent", the final gate of
    every curated-corpus build.

    The textbook form is a cumulative sum over the GLOBAL order — a
    single-partition window, the canonical scale anti-pattern. Exact and
    distributed instead via score-histogram routing:

    1. quantize score to ``n_buckets`` fixed buckets (one projection);
    2. aggregate per-bucket (count, cost sum) — a bounded table
       (<= n_buckets rows regardless of corpus size);
    3. running total over the DESC-ordered bucket table finds the CUT
       bucket (the first whose cumulative cost exceeds the budget) — a
       window over the bounded table (the documented sketch-sized-window
       class);
    4. buckets strictly above the cut are taken whole (broadcast-joined
       threshold filter, zero shuffle of the corpus); the cut bucket
       alone gets the exact per-row cumulative window, partitioned BY the
       bucket — one partition holding only near-tie rows.

    Exactness: floor is monotone, ties in quantized score share a bucket,
    and within the cut bucket the exact (score DESC, id) order is used —
    so the selected set is IDENTICAL to the global-window formulation
    (the DuckDB oracle runs that one). Scores must lie in [0, 1]
    (quantization domain); rescale first otherwise. NULL scores are
    excluded from selection (filter them beforehand to surface them —
    same contract as curriculum_buckets' NULL handling).
    """
    b = F.floor(F.col(score_col) * F.lit(float(n_buckets))).cast("long")
    src = df.select(
        F.col(id_col), F.col(score_col), F.col(cost_col), b.alias("_b")
    )
    hist = src.groupBy("_b").agg(F.sum(cost_col).alias("_c"))
    wcum = Window.orderBy(F.col("_b").desc())  # bounded: <= n_buckets rows
    hist = hist.select(
        "_b", (F.sum("_c").over(wcum)).alias("_cum"), "_c"
    )
    # cut bucket = first (highest-score-first) bucket whose cumulative
    # total exceeds the budget; everything above it fits entirely
    cut = hist.where(F.col("_cum") > F.lit(float(budget))).select(
        F.max("_b").alias("_cut_b"),
        # cost already spent by buckets ABOVE the cut — taken from the cut
        # bucket's own row (max_by on _b), not an independent max: _cum
        # grows as _b descends, so max(_cum - _c) would read the BOTTOM
        # bucket's prefix
        F.max_by(F.col("_cum") - F.col("_c"), F.col("_b")).alias("_spent"),
    )
    full = src.join(
        F.broadcast(cut),
        src["_b"] > F.coalesce(F.col("_cut_b"), F.lit(-(1 << 62))),
        "inner",
    ).select(id_col, score_col, cost_col)
    wb = Window.partitionBy("_b").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    partial = (
        src.join(F.broadcast(cut), src["_b"] == F.col("_cut_b"), "inner")
        .withColumn("_rowcum", F.sum(cost_col).over(wb) + F.col("_spent"))
        .where(F.col("_rowcum") <= F.lit(float(budget)))
        .select(id_col, score_col, cost_col)
    )
    return full.unionByName(partial)
