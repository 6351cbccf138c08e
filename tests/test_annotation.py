"""Annotation-QA / preference analytics (operators/annotation.py) and
conversation-tree linearization (graph.tree_paths)."""

import math

import pandas as pd
import pytest

from amazon_security_lake_transformation_library_spark.operators import annotation as ann
from amazon_security_lake_transformation_library_spark.operators import graph as g


def _ratings(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["item_id", "rater_id", "label"])
    )


# ------------------------------------------------------------- Cohen's kappa

def test_cohen_kappa_textbook(spark):
    # classic 2x2 example: 50 items, raters agree on 20 yes + 15 no,
    # disagree on 15 -> po = 0.70; marginals A: 25 yes, B: 30 yes ->
    # pe = 0.5*0.6 + 0.5*0.4 = 0.5 -> kappa = 0.4
    rows = []
    i = 0
    for _ in range(20):
        rows += [(i, 0, "yes"), (i, 1, "yes")]; i += 1
    for _ in range(15):
        rows += [(i, 0, "no"), (i, 1, "no")]; i += 1
    for _ in range(5):
        rows += [(i, 0, "yes"), (i, 1, "no")]; i += 1
    for _ in range(10):
        rows += [(i, 0, "no"), (i, 1, "yes")]; i += 1
    out = ann.cohen_kappa_pairs(_ratings(spark, rows)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["rater_a"], r["rater_b"], r["n_items"]) == (0, 1, 50)
    assert r["po"] == 0.7
    assert r["pe"] == 0.5
    assert r["kappa"] == 0.4


def test_cohen_kappa_marginals_on_common_items_only(spark):
    # rater 2 shares only item 0 with rater 0 — that pair's stats must
    # ignore the rest of rater 0's items; degenerate all-agree single
    # item => pe == 1 path => kappa = 1.0
    rows = [(0, 0, "x"), (0, 2, "x"), (1, 0, "y"), (2, 0, "z")]
    out = (
        ann.cohen_kappa_pairs(_ratings(spark, rows))
        .toPandas()
        .set_index(["rater_a", "rater_b"])
    )
    assert out.loc[(0, 2), "n_items"] == 1
    assert out.loc[(0, 2), "kappa"] == 1.0


def test_cohen_kappa_min_items_filter(spark):
    rows = [(0, 0, "x"), (0, 1, "x"), (1, 0, "x"), (1, 1, "y")]
    out = ann.cohen_kappa_pairs(_ratings(spark, rows), min_items=3).toPandas()
    assert len(out) == 0


# ------------------------------------------------------------- Fleiss' kappa

def test_fleiss_kappa_perfect_agreement(spark):
    rows = [(i, r, "same" if i % 2 else "other") for i in range(4) for r in range(3)]
    out = ann.fleiss_kappa(_ratings(spark, rows)).toPandas().iloc[0]
    assert out["n_items"] == 4 and out["n_ratings"] == 12
    assert out["p_bar"] == 1.0
    # two labels at 0.5 each -> pe = 0.5, kappa = (1-0.5)/(1-0.5) = 1
    assert out["p_e"] == 0.5
    assert out["kappa"] == 1.0


def test_fleiss_kappa_variable_raters_and_singletons(spark):
    # item 0: 3 raters (2 agree), item 1: 2 raters agree, item 2: single
    # rating -> excluded from n_items/n_ratings and label totals
    rows = [
        (0, 0, "a"), (0, 1, "a"), (0, 2, "b"),
        (1, 0, "b"), (1, 1, "b"),
        (2, 0, "c"),
    ]
    out = ann.fleiss_kappa(_ratings(spark, rows)).toPandas().iloc[0]
    assert out["n_items"] == 2 and out["n_ratings"] == 5
    # P_0 = (4+1-3)/(3*2) = 1/3 ; P_1 = (4-2)/2 = 1 -> p_bar = 2/3
    assert out["p_bar"] == round(2 / 3, 4)
    # labels over retained items: a=2, b=3 of 5 -> pe = .16+.36 = .52
    assert out["p_e"] == 0.52
    assert out["kappa"] == round((2 / 3 - 0.52) / 0.48, 4)


# ------------------------------------------------------------ Bradley-Terry

def test_bradley_terry_dominant_item_strongest(spark):
    rows = [("a", "b")] * 8 + [("b", "a")] * 2 + [("b", "c")] * 7 + [("c", "b")] * 3
    m = spark.createDataFrame(pd.DataFrame(rows, columns=["winner", "loser"]))
    out = ann.bradley_terry(m, iters=20).toPandas().set_index("item")
    assert out.loc["a", "wins"] == 8 and out.loc["a", "games"] == 10
    assert out.loc["b", "games"] == 20
    assert out.loc["a", "strength"] > out.loc["b", "strength"] > out.loc["c", "strength"]
    # strengths renormalized to mean 1
    assert abs(out["strength"].mean() - 1.0) < 1e-3
    # fitted model should reproduce the observed head-to-head rate
    sa, sb = out.loc["a", "strength"], out.loc["b", "strength"]
    assert abs(sa / (sa + sb) - 0.8) < 0.01


def test_bradley_terry_zero_win_item(spark):
    rows = [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")]
    m = spark.createDataFrame(pd.DataFrame(rows, columns=["winner", "loser"]))
    out = ann.bradley_terry(m, iters=5).toPandas().set_index("item")
    assert out.loc["c", "wins"] == 0
    assert out.loc["c", "strength"] == 0.0


def test_bradley_terry_partition_invariant(spark):
    rows = [(f"m{i % 4}", f"m{(i + 1 + i // 7) % 4}") for i in range(200)]
    rows = [(w, l) for w, l in rows if w != l]
    pdf = pd.DataFrame(rows, columns=["winner", "loser"])
    a = ann.bradley_terry(spark.createDataFrame(pdf), iters=8).toPandas()
    b = ann.bradley_terry(
        spark.createDataFrame(pdf).repartition(13), iters=8
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("item").reset_index(drop=True),
        b.sort_values("item").reset_index(drop=True),
    )


# ----------------------------------------------------------------- tree paths

def _forest(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["node_id", "parent_id"]).astype(
            {"node_id": "int64", "parent_id": "Int64"}
        )
    )


def test_tree_paths_chain_and_branch(spark):
    # tree: 1 -> 2 -> 3, 2 -> 4 ; second root 10 (isolated)
    rows = [(1, None), (2, 1), (3, 2), (4, 2), (10, None)]
    out = g.tree_paths(_forest(spark, rows)).toPandas().set_index("node_id")
    assert out.loc[3, "path"] == "1/2/3" and out.loc[3, "depth"] == 2
    assert out.loc[4, "path"] == "1/2/4"
    assert out.loc[1, "path"] == "1" and out.loc[1, "depth"] == 0
    assert out.loc[10, "root_id"] == 10
    assert set(out.index) == {1, 2, 3, 4, 10}

    leaves = g.tree_paths(_forest(spark, rows), leaves_only=True).toPandas()
    assert set(leaves["node_id"]) == {3, 4, 10}


def test_tree_paths_deep_chain_log_rounds(spark):
    # a 33-deep chain requires pointer doubling (6 rounds), not 33
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 34)]
    out = g.tree_paths(_forest(spark, rows), max_iters=7).toPandas()
    deep = out.set_index("node_id").loc[33]
    assert deep["depth"] == 33
    assert deep["path"] == "/".join(str(i) for i in range(34))
    assert deep["root_id"] == 0


def test_tree_paths_nonconvergence_raises(spark):
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 34)]
    with pytest.raises(RuntimeError):
        g.tree_paths(_forest(spark, rows), max_iters=2)


# ------------------------------------------------------------- gold labels

def test_majority_gold_labels_tiebreak_and_entropy(spark):
    rows = [
        (0, 0, "a"), (0, 1, "a"), (0, 2, "b"),          # majority a, 2/3
        (1, 0, "x"), (1, 1, "y"),                        # tie -> smallest "x"
        (2, 0, "z"),                                     # unanimous singleton
    ]
    out = (
        ann.majority_gold_labels(_ratings(spark, rows))
        .toPandas()
        .set_index("item_id")
    )
    assert out.loc[0, "gold_label"] == "a"
    assert out.loc[0, "gold_frac"] == round(2 / 3, 4)
    assert out.loc[0, "vote_entropy"] == round(
        math.log(3) - (2 * math.log(2)) / 3, 4
    )
    assert out.loc[1, "gold_label"] == "x"
    assert out.loc[1, "gold_frac"] == 0.5
    assert out.loc[1, "vote_entropy"] == round(math.log(2), 4)
    assert out.loc[2, "gold_frac"] == 1.0
    assert out.loc[2, "vote_entropy"] == 0.0


def test_majority_gold_labels_min_votes(spark):
    rows = [(0, 0, "a"), (0, 1, "a"), (1, 0, "b")]
    out = ann.majority_gold_labels(_ratings(spark, rows), min_votes=2).toPandas()
    assert set(out["item_id"]) == {0}
