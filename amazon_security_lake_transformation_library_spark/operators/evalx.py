"""Distributed evaluation metrics for training pipelines: ROC-AUC via
the rank-sum identity and calibration (reliability) binning.

Why these live in the engine: a 10^12-row training table is scored by a
model and the AUC / calibration of that score column must be computed
WHERE THE DATA IS — collecting scores to a driver or a single node is
the anti-pattern these operators replace.

Scale design
------------
``roc_auc`` never ranks individual rows. It first aggregates to the
(group, distinct score) contingency table — a map-side-combined hash
aggregate, output |distinct scores| rows per group — then applies ONE
cumulative window over that (much smaller) table and folds the
Mann-Whitney sum:  AUC = Σ_s pos(s)·(neg_below(s) + neg(s)/2) / (P·N),
which is exactly the trapezoidal area under the ROC curve with the
standard mid-rank tie treatment. Quantize continuous scores with
``round_to`` to bound the contingency table (the usual move for
monotone-invariant AUC at extreme cardinality).

The reference library computes no metrics at all (SURVEY.md §2.B); this
is north-rule surface for the feature-engineering pipeline's evaluation
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    by: list[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """ROC-AUC of ``score_col`` against binary ``label_col`` (0/1),
    optionally per ``by`` group. Returns one row per group with
    ``auc`` (4 dp), ``n_pos``, ``n_neg``. AUC is NULL when a group has
    no positives or no negatives (undefined, not 0.5 — downstream
    dashboards must see the degenerate group, not a fake coin-flip).

    Ties receive the mid-rank treatment (each positive tied with k
    negatives at the same score contributes k/2), matching
    sklearn.roc_auc_score exactly.
    """
    keys = list(by or [])
    s = (
        F.round(F.col(score_col), round_to)
        if round_to is not None
        else F.col(score_col)
    )
    contingency = (
        df.select(
            *keys,
            s.alias("__s"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy(*keys, "__s")
        .agg(
            F.sum("__y").alias("__pos"),
            (F.count(F.lit(1)) - F.sum("__y")).alias("__neg"),
        )
    )
    w = (
        Window.partitionBy(*keys).orderBy("__s")
        if keys
        else Window.partitionBy().orderBy("__s")
    ).rowsBetween(Window.unboundedPreceding, -1)
    scored = contingency.withColumn(
        "__neg_below", F.coalesce(F.sum("__neg").over(w), F.lit(0))
    )
    agg = scored.groupBy(*keys).agg(
        F.sum(
            F.col("__pos")
            * (F.col("__neg_below") + F.col("__neg") / F.lit(2.0))
        ).alias("__u"),
        F.sum("__pos").alias("n_pos"),
        F.sum("__neg").alias("n_neg"),
    )
    return agg.select(
        *keys,
        F.round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("__u") / (F.col("n_pos") * F.col("n_neg")),
            ),
            4,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Reliability-diagram bins for a probability score in [0, 1]:
    equal-width bins with per-bin count, mean predicted score, and
    observed positive rate (all 4 dp). Scores exactly at 1.0 fold into
    the top bin. ONE hash aggregate keyed on (group, bin) — map-side
    partial combine makes this a linear scan at any scale."""
    keys = list(by or [])
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.select(
            *keys,
            b.alias("bin"),
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .groupBy(*keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__s"), 4).alias("mean_score"),
            F.round(F.avg("__y"), 4).alias("pos_rate"),
        )
    )
