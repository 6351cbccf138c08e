"""BM25 retrieval + kNN label-consistency metrics (operators/retrieval.py).

BM25 is checked against an independent pure-Python scorer (same corpus,
textbook formula, math.log) — two implementations, one answer — plus the
structural contracts (zero-score exclusion, deterministic id tiebreak,
k-capping). knn_label_metrics is checked on a constructed embedding set
whose neighbor structure is known by design.
"""

import math

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import retrieval as ret


DOCS = [
    (1, "spark window merge spark"),
    (2, "window window window table"),
    (3, "vector vector spark"),
    (4, "table row column"),          # no query term -> excluded
    (5, "merge"),
    (6, "Spark, WINDOW; merge!"),     # case/punct normalization
]
TERMS = ["spark", "window", "merge", "vector"]
K1, B = 1.2, 0.75


def _py_bm25(docs, terms, k1=K1, b=B):
    toks = {d: [w for w in t.lower().replace(",", " ").replace(";", " ")
                .replace("!", " ").split() if w] for d, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(ws) / avgdl))
        out[d] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_independent_scorer(spark, docs_df):
    got = {
        r.doc_id: r.score
        for r in ret.bm25_topk(docs_df, TERMS, k=10).collect()
    }
    want = _py_bm25(DOCS, TERMS)
    assert 4 not in got  # zero-score doc excluded
    for d, s in want.items():
        if s > 0:
            assert got[d] == pytest.approx(round(s, 4), abs=1e-4), d


def test_bm25_rank_order_and_k_cap(spark, docs_df):
    rows = ret.bm25_topk(docs_df, TERMS, k=3).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # identical docs (ties) break on doc_id ascending
    dup = spark.createDataFrame(
        [(10, "spark spark"), (11, "spark spark"), (12, "spark spark")],
        ["doc_id", "text"],
    )
    tied = ret.bm25_topk(dup, ["spark"], k=3).collect()
    assert [r.doc_id for r in tied] == [10, 11, 12]


def test_bm25_rejects_empty_query(docs_df):
    with pytest.raises(ValueError):
        ret.bm25_topk(docs_df, [])


def test_knn_label_metrics_known_geometry(spark):
    # Two tight clusters on orthogonal axes: every vector's neighbors
    # within k=2 are exactly its own cluster -> p@2 = 1.0, mrr = 1.0.
    rows = []
    for i in range(3):
        rows.append((i, [1.0, 0.01 * i, 0.0], 0))
        rows.append((10 + i, [0.0, 0.01 * i, 1.0], 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        r.label: r
        for r in ret.knn_label_metrics(
            emb, [0, 1, 2, 10, 11, 12], k=2
        ).collect()
    }
    assert set(out) == {0, 1}
    for lbl in (0, 1):
        assert out[lbl].n_queries == 3
        assert out[lbl].p_at_k == pytest.approx(1.0)
        assert out[lbl].mrr == pytest.approx(1.0)


def test_knn_label_metrics_no_same_label_neighbor(spark):
    # A singleton label has no same-label neighbor: p@k = 0, mrr = 0.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 1),
            (2, [0.8, 0.2], 1),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = {r.label: r for r in ret.knn_label_metrics(emb, [0], k=2).collect()}
    assert out[0].p_at_k == pytest.approx(0.0)
    assert out[0].mrr == pytest.approx(0.0)


# ------------------------------------------------- multi-query posting path

def test_bm25_multi_matches_single_query_form(spark):
    """The posting-list batch formulation and the constant-term in-row
    formulation are different plans over the same math — per query term
    set they must produce identical rounded scores and ranks."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    for terms in (["spark"], ["window", "merge"], TERMS):
        qid = "+".join(terms)
        wl = spark.createDataFrame(
            [(qid, t) for t in terms], ["query_id", "term"]
        )
        single = {
            r["doc_id"]: (r["rank"], r["score"])
            for r in ret.bm25_topk(docs, terms, k=10).collect()
        }
        multi = {
            r["doc_id"]: (r["rank"], r["score"])
            for r in ret.bm25_topk_multi(docs, wl, k=10).collect()
        }
        assert multi == single, terms


def test_bm25_multi_queries_are_independent(spark):
    """Adding a second query to the workload must not change the first
    query's rows (df/N/avgdl are corpus stats, not workload stats)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    one = spark.createDataFrame(
        [("a", "spark"), ("a", "merge")], ["query_id", "term"]
    )
    two = spark.createDataFrame(
        [("a", "spark"), ("a", "merge"), ("b", "window")],
        ["query_id", "term"],
    )
    r1 = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in ret.bm25_topk_multi(docs, one, k=10).collect()
    }
    r2 = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in ret.bm25_topk_multi(docs, two, k=10).collect()
        if r["query_id"] == "a"
    }
    assert r1 == r2


def test_bm25_multi_k_cap_and_zero_exclusion(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    wl = spark.createDataFrame([("q", "spark")], ["query_id", "term"])
    out = ret.bm25_topk_multi(docs, wl, k=2).collect()
    assert len(out) == 2 and [r["rank"] for r in out] != []
    # doc 4 has no query term anywhere -> absent even with huge k
    all_rows = ret.bm25_topk_multi(docs, wl, k=100).collect()
    assert 4 not in {r["doc_id"] for r in all_rows}
