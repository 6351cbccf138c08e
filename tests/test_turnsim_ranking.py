"""Hand-computed oracles for turnsim.* and retrieval.ranking_metrics.

The differential gate checks these against DuckDB at corpus scale; the
cases here pin the EDGE semantics the synthetic corpora never hit:
exact repeats, prefix-cap collisions, run breaks, unretrieved-relevant
queries, and perfect rankings.
"""

import math

import pandas as pd
import pyspark.sql.functions as F
import pytest

from amazon_security_lake_transformation_library_spark.operators import (
    retrieval as ret,
    turnsim as tsim,
)


def _transcript(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    )
    pdf["ts"] = pd.Timestamp("2024-01-01")
    return spark.createDataFrame(pdf)


def test_consecutive_similarity_exact_and_cap(spark):
    t = _transcript(
        spark,
        [
            ("c1", 0, "assistant", "hello world", None),
            ("c1", 1, "user", "ignored", None),
            ("c1", 2, "assistant", "hello world", None),   # exact repeat
            ("c1", 4, "assistant", "goodbye moon", None),  # different
            ("c2", 0, "assistant", "only one assistant turn", None),
            # c3: differ ONLY past the 8-char cap -> lev_ratio 1.0 on the
            # capped prefix but exact_repeat False, jaccard < 1
            ("c3", 0, "assistant", "prefix12 alpha", None),
            ("c3", 1, "assistant", "prefix12 omega", None),
        ],
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in tsim.consecutive_turn_similarity(
            t, max_chars=8
        ).collect()
    }
    assert set(out) == {("c1", 2), ("c1", 4), ("c3", 1)}
    r = out[("c1", 2)]
    assert r["prev_turn_idx"] == 0
    assert r["lev_ratio"] == 1.0 and r["jaccard"] == 1.0 and r["exact_repeat"]
    r = out[("c1", 4)]
    assert r["lev_ratio"] < 1.0 and r["jaccard"] == 0.0
    assert not r["exact_repeat"]
    r = out[("c3", 1)]
    assert r["lev_ratio"] == 1.0          # capped prefixes identical
    assert not r["exact_repeat"]          # full texts differ
    assert r["jaccard"] == pytest.approx(1.0 / 3.0, abs=1e-4)


def test_consecutive_similarity_known_levenshtein(spark):
    # lev("kitten","sitting") = 3, maxlen 7 -> ratio 1 - 3/7
    t = _transcript(
        spark,
        [
            ("c1", 0, "assistant", "kitten", None),
            ("c1", 1, "assistant", "sitting", None),
        ],
    )
    [r] = tsim.consecutive_turn_similarity(t).collect()
    assert r["lev_ratio"] == round(1.0 - 3.0 / 7.0, 4)


def test_tool_loop_runs_breaks(spark):
    t = _transcript(
        spark,
        [
            # c1: turns 0-2 same tool contiguous (run 3), turn 3 other tool
            ("c1", 0, "tool", "x", "search"),
            ("c1", 1, "tool", "x", "search"),
            ("c1", 2, "tool", "x", "search"),
            ("c1", 3, "tool", "x", "calc"),
            # c2: same tool but an interleaved user turn breaks adjacency
            ("c2", 0, "tool", "x", "search"),
            ("c2", 1, "user", "q", None),
            ("c2", 2, "tool", "x", "search"),
            # c3: adjacent same tool -> run 2
            ("c3", 5, "tool", "x", "calc"),
            ("c3", 6, "tool", "x", "calc"),
        ],
    )
    runs = {
        (r["conv_id"], r["tool"]): r
        for r in tsim.tool_loop_runs(t, min_run=2).collect()
    }
    assert set(runs) == {("c1", "search"), ("c3", "calc")}
    assert runs[("c1", "search")]["run_len"] == 3
    assert runs[("c1", "search")]["start_turn"] == 0
    assert runs[("c1", "search")]["end_turn"] == 2
    assert runs[("c3", "calc")]["run_len"] == 2


def test_ranking_metrics_hand_computed(spark):
    run = spark.createDataFrame(
        pd.DataFrame(
            {
                # q1: relevant docs at ranks 2 and 5 (d2 rel 1, d5 rel 2)
                # q2: nothing relevant retrieved
                # q3: the single relevant doc at rank 1 -> perfect
                "query_id": ["q1"] * 5 + ["q2"] * 2 + ["q3"],
                "doc_id": [1, 2, 3, 4, 5, 9, 8, 7],
                "rank": [1, 2, 3, 4, 5, 1, 2, 1],
            }
        )
    )
    qrels = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q1", "q1", "q2", "q3"],
                "doc_id": [2, 5, 99, 7],
                "rel": [1.0, 2.0, 1.0, 1.0],
            }
        )
    )
    out = {r["query_id"]: r for r in ret.ranking_metrics(run, qrels, k=3).collect()}
    assert set(out) == {"q1", "q2", "q3"}

    q1 = out["q1"]
    assert q1["rr"] == 0.5 and q1["n_rel"] == 2 and q1["hits_k"] == 1
    # dcg@3: only d2 (rel 1) inside the cutoff -> 1/log2(3)
    dcg = 1.0 / math.log2(3.0)
    idcg = 3.0 / math.log2(2.0) + 1.0 / math.log2(3.0)  # rels [2,1]
    assert q1["ndcg_k"] == round(dcg / idcg, 4)
    assert q1["precision_k"] == round(1 / 3, 4)
    assert q1["recall_k"] == 0.5

    q2 = out["q2"]
    assert (q2["rr"], q2["ndcg_k"], q2["recall_k"]) == (0.0, 0.0, 0.0)

    q3 = out["q3"]
    assert (q3["rr"], q3["ndcg_k"], q3["precision_k"]) == (1.0, 1.0, round(1 / 3, 4))
    assert q3["recall_k"] == 1.0


def test_ranking_metrics_rr_beyond_cutoff(spark):
    # MRR convention: rr counts ANY retrieved rank, ndcg/precision cut at k
    run = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q"] * 4, "doc_id": [1, 2, 3, 4],
                      "rank": [1, 2, 3, 4]})
    )
    qrels = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q"], "doc_id": [4], "rel": [1.0]})
    )
    [r] = ret.ranking_metrics(run, qrels, k=2).collect()
    assert r["rr"] == 0.25
    assert r["ndcg_k"] == 0.0 and r["hits_k"] == 0
