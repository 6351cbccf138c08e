"""Annotation-QA and preference analytics for labeling / RLHF pipelines.

A training-data operation the reference has no analog for (its per-row
Lambda transform, transformation_function/app.py:112-148, maps log lines
independently): once transcripts are rated by human or model judges, the
pipeline needs to (a) quantify rater reliability before trusting labels
(Cohen's kappa per rater pair, Fleiss' kappa per task), and (b) turn
pairwise preference votes into per-model strength scores (Bradley-Terry),
the standard preamble to reward-model training and leaderboard ranking.

Scale design
------------
All heavy lifting is count aggregation over the rating/vote stream:

* ``cohen_kappa_pairs`` self-joins ratings on the ITEM key. Fan-out per
  item is R^2 where R is the number of raters who touched that item —
  bounded by the rater panel, not the corpus — and every downstream
  aggregate shuffles on the (rater_a, rater_b) pair key, so a billion
  ratings reduce to a raters^2-sized result with two shuffles.
* ``fleiss_kappa`` is two hash aggregates (item x label, then item) plus
  one global fold — no joins, no per-rater state.
* ``bradley_terry`` reduces the vote stream to an items^2-bounded
  directed pair-count table with ONE distributed aggregate, then runs
  the MM fixed-point (Hunter 2004) on the driver in numpy. The driver
  step is justified the same way the ANN centroid collect is: the item
  vocabulary is the set of compared MODELS/policies — dozens to a few
  thousand — while the distributed pass absorbs the unbounded vote
  volume. Deterministic: numpy accumulates in fixed dense order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cohen_kappa_pairs",
    "fleiss_kappa",
    "bradley_terry",
    "majority_gold_labels",
]


def _r4(c: Column) -> Column:
    return F.round(c, 4) + F.lit(0.0)


def cohen_kappa_pairs(
    ratings: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    label_col: str = "label",
    min_items: int = 1,
) -> DataFrame:
    """Cohen's kappa for every pair of raters, over the items BOTH rated.

    Input: one row per (item, rater) with a categorical label (callers
    dedupe multi-annotations first — e.g. ``groupBy(item, rater).agg(min
    (label))``). For each unordered rater pair (a < b):

        po = fraction of co-rated items with equal labels
        pe = sum_l  p_a(l) * p_b(l)     (marginals on the co-rated set)
        kappa = (po - pe) / (1 - pe)

    ``pe == 1`` forces both marginals onto one identical label, which
    forces ``po == 1`` — that degenerate all-agree case scores 1.0
    instead of 0/0. Pairs with fewer than ``min_items`` common items are
    dropped (kappa is noise on tiny overlap).

    Shape: item-keyed self-join (fan-out bounded by the per-item rater
    panel), then pair-keyed hash aggregates; the label-marginal join is
    pair x label -> pair, all map-side-combinable. Output is one row per
    rater pair.
    """
    it, rt, lb = F.col(item_col), F.col(rater_col), F.col(label_col)
    a = ratings.select(
        it.alias("__it"), rt.alias("rater_a"), lb.alias("__la")
    )
    b = ratings.select(
        it.alias("__it"), rt.alias("rater_b"), lb.alias("__lb")
    )
    j = a.join(b, "__it").where(F.col("rater_a") < F.col("rater_b"))
    keys = ["rater_a", "rater_b"]

    obs = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("__la") == F.col("__lb")).cast("long")).alias("__agree"),
    )
    ma = j.groupBy(*keys, F.col("__la").alias("__l")).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    mb = j.groupBy(*keys, F.col("__lb").alias("__l")).agg(
        F.count(F.lit(1)).alias("__cb")
    )
    # inner join: a label absent on either side contributes 0 to pe
    pe_tab = (
        ma.join(mb, keys + ["__l"])
        .groupBy(*keys)
        .agg(F.sum(F.col("__ca").cast("double") * F.col("__cb")).alias("__pp"))
    )
    po = F.col("__agree") / F.col("n_items")
    pe = F.col("__pp") / (F.col("n_items").cast("double") * F.col("n_items"))
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).otherwise(F.lit(1.0))
    return (
        obs.join(pe_tab, keys)
        .where(F.col("n_items") >= min_items)
        .select(
            "rater_a",
            "rater_b",
            "n_items",
            _r4(po).alias("po"),
            _r4(pe).alias("pe"),
            _r4(kappa).alias("kappa"),
        )
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item_id",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa over the whole rating table, one output row.

    Uses the variable-rater generalization: per item i with n_i >= 2
    ratings and n_il of label l,

        P_i   = (sum_l n_il^2 - n_i) / (n_i * (n_i - 1))
        p_bar = mean_i P_i
        p_l   = sum_i n_il / sum_i n_i          (over retained items)
        p_e   = sum_l p_l^2
        kappa = (p_bar - p_e) / (1 - p_e)       (1.0 when p_e == 1)

    Items rated once carry no agreement signal and are excluded (their
    count is reported). Two hash aggregates plus a global fold — the
    whole computation is one pass over the ratings, no joins.
    """
    cnt = ratings.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_item = (
        cnt.groupBy(item_col)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
        )
        .where(F.col("__n") >= 2)
    )
    p_i = (F.col("__ss") - F.col("__n")) / (
        F.col("__n").cast("double") * (F.col("__n") - 1)
    )
    item_stats = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__n").alias("n_ratings"),
        F.avg(p_i).alias("__pbar"),
    )
    # label totals over RETAINED items only: semi-join the per-item filter
    lbl = (
        cnt.join(per_item.select(item_col), item_col, "semi")
        .groupBy(label_col)
        .agg(F.sum("__c").alias("__cl"))
        .agg(
            F.sum(F.col("__cl") * F.col("__cl")).alias("__sql_"),
            F.sum("__cl").alias("__tot"),
        )
    )
    pe = F.col("__sql_") / (F.col("__tot").cast("double") * F.col("__tot"))
    kappa = F.when(
        pe < 1.0, (F.col("__pbar") - pe) / (F.lit(1.0) - pe)
    ).otherwise(F.lit(1.0))
    return item_stats.crossJoin(lbl).select(
        "n_items",
        "n_ratings",
        _r4(F.col("__pbar")).alias("p_bar"),
        _r4(pe).alias("p_e"),
        _r4(kappa).alias("kappa"),
    )


def bradley_terry(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 8,
) -> DataFrame:
    """Bradley-Terry strengths from pairwise win/loss votes.

    Model: P(i beats j) = s_i / (s_i + s_j). Fitted with Hunter's MM
    update, ``iters`` rounds from the uniform start, strengths
    renormalized to mean 1 each round (the BT likelihood is scale
    invariant; fixing the mean makes the fixed point unique and the
    unrolled SQL oracle reproducible):

        s_i <- W_i / sum_{j != i} n_ij / (s_i + s_j)

    Distributed part: ONE aggregate folds the vote stream (arbitrarily
    large) into the directed pair-count table (items^2-bounded). The MM
    rounds then run in numpy on the driver over that table — items are
    the compared models/policies, a small vocabulary by construction;
    see the module docstring for why this is the scale-correct split.
    Items that never won keep strength 0 after round 1 (the MLE boundary
    case); items that never lost drift to the simplex edge, which
    bounded ``iters`` keeps finite — both standard BT behaviors.

    Returns one row per item: wins, games, strength (4 dp).
    """
    spark = matches.sparkSession
    w, l = F.col(winner_col), F.col(loser_col)
    directed = matches.select(w.alias("i"), l.alias("j"), F.lit(1).alias("__w")).unionAll(
        matches.select(l.alias("i"), w.alias("j"), F.lit(0).alias("__w"))
    )
    pc = (
        directed.groupBy("i", "j")
        .agg(F.sum("__w").alias("w_ij"), F.count(F.lit(1)).alias("n_ij"))
        .toPandas()
        .sort_values(["i", "j"], kind="mergesort")
        .reset_index(drop=True)
    )
    if pc.empty:
        item_t = dict(matches.dtypes).get(winner_col, "string")
        return spark.createDataFrame(
            [], f"item {item_t}, wins long, games long, strength double"
        )
    items = np.unique(np.concatenate([pc["i"].values, pc["j"].values]))
    idx = {v: k for k, v in enumerate(items)}
    ii = pc["i"].map(idx).values.astype(np.int64)
    jj = pc["j"].map(idx).values.astype(np.int64)
    n_ij = pc["n_ij"].values.astype(np.float64)
    w_ij = pc["w_ij"].values.astype(np.float64)
    wins = np.zeros(len(items))
    np.add.at(wins, ii, w_ij)
    games = np.zeros(len(items))
    np.add.at(games, ii, n_ij)

    s = np.ones(len(items))
    for _ in range(iters):
        denom = np.zeros(len(items))
        np.add.at(denom, ii, n_ij / (s[ii] + s[jj]))
        s = np.where(denom > 0, wins / np.where(denom > 0, denom, 1.0), 0.0)
        m = s.mean()
        if m > 0:
            s = s / m

    out = pd.DataFrame(
        {
            "item": items,
            "wins": wins.astype(np.int64),
            "games": games.astype(np.int64),
            "strength": np.round(s, 4) + 0.0,
        }
    )
    return spark.createDataFrame(out)


def majority_gold_labels(
    ratings: DataFrame,
    item_col: str = "item_id",
    label_col: str = "label",
    min_votes: int = 1,
) -> DataFrame:
    """Gold-label aggregation: per item, the majority-vote label plus the
    disagreement diagnostics downstream filters key on.

        gold_label   majority label; ties broken to the lexicographically
                     smallest (deterministic under any partitioning)
        gold_frac    votes for gold_label / total votes
        vote_entropy Shannon entropy (nats) of the vote distribution —
                     0 for unanimous items, ln(k) for k-way uniform splits

    The standard step between rater-agreement QA (kappa families above)
    and training: unanimous items become labels, high-entropy items go
    back for re-annotation or get routed to adjudication.

    Shape: one shuffle to (item, label) counts, then an item-keyed
    aggregate where the argmax rides a single ``min(struct(-count,
    label))`` — no window, no second pass over the votes. Both
    aggregates combine map-side, so a billion votes reduce to an
    items-sized table with two exchanges.
    """
    cnt = ratings.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    top = F.min(
        F.struct((-F.col("__c")).alias("nc"), F.col(label_col).alias("l"))
    )
    n = F.sum("__c")
    return (
        cnt.groupBy(item_col)
        .agg(
            n.alias("n_votes"),
            top.alias("__top"),
            F.sum(
                F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
            ).alias("__clogc"),
        )
        .where(F.col("n_votes") >= min_votes)
        .select(
            item_col,
            "n_votes",
            F.col("__top.l").alias("gold_label"),
            _r4((-F.col("__top.nc")) / F.col("n_votes")).alias("gold_frac"),
            # sum p ln(1/p) = ln(n) - (1/n) sum c ln(c): one pass, no
            # per-label division before the fold
            _r4(
                F.log(F.col("n_votes").cast("double"))
                - F.col("__clogc") / F.col("n_votes")
            ).alias("vote_entropy"),
        )
    )
