"""PageRank (graph.pagerank) + KMV set overlap (sketch.kmv_set_overlap).

PageRank is checked against an independent dense numpy power iteration
(same damping/dangling formulation) and on analytic graphs; overlap is
checked in the exact regime (k >= distinct counts) against set algebra
and for estimator sanity in the sketched regime.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import graph as g
from amazon_security_lake_transformation_library_spark.operators import sketch as sk


def _np_pagerank(edges, d=0.85, iters=5):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
    outw = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dm = 0.0
        for i in range(n):
            if outw[i] > 0:
                contrib += r[i] * w[i] / outw[i]
            else:
                dm += r[i]
        r = (1 - d) / n + d * (contrib + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


def _spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst", "w"]).repartition(4)
    out = g.pagerank(df, weight_col="w", **kw)
    return {r.node: r.rank for r in out.collect()}


def test_pagerank_two_node_cycle(spark):
    got = _spark_pagerank(spark, [("a", "b", 1.0), ("b", "a", 1.0)])
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_pagerank_dangling_node(spark):
    # a -> b, b has no out-edges: dangling mass redistributes uniformly
    got = _spark_pagerank(spark, [("a", "b", 1.0)], iterations=1)
    assert got["a"] == pytest.approx(0.075 + 0.85 * 0.25)
    assert got["b"] == pytest.approx(0.075 + 0.85 * 0.75)


def test_pagerank_matches_numpy_and_sums_to_one(spark):
    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "a", 3.0), ("b", "d", 0.5),
    ]
    got = _spark_pagerank(spark, edges, iterations=6)
    want = _np_pagerank(edges, iters=6)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_partitioning_invariant(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 2.0)]
    one = _spark_pagerank(spark, edges)
    df13 = spark.createDataFrame(edges, ["src", "dst", "w"]).repartition(13)
    other = {r.node: r.rank for r in g.pagerank(df13, weight_col="w").collect()}
    assert one == pytest.approx(other)


def test_kmv_overlap_exact_regime(spark):
    a = spark.createDataFrame([(i,) for i in range(1, 11)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(6, 16)], ["v"])
    r = sk.kmv_set_overlap(a, b, "v", k=64).collect()[0]
    assert (r.est_a, r.est_b, r.est_union) == (10.0, 10.0, 15.0)
    assert r.est_intersection == pytest.approx(5.0)
    assert r.jaccard_est == pytest.approx(round(5.0 / 15.0, 4))


def test_kmv_overlap_sketched_regime_matches_independent_kmv(spark):
    # k=32 < |A|,|B|: the estimates must equal an INDEPENDENT pure-Python
    # replay of the (k-1)/h_k estimator on the same md5 hash fractions
    # (this particular value set draws a ~+70% unlucky 32nd order
    # statistic — the point is the sketch math, not the luck).
    import hashlib

    def frac(v):
        h = hashlib.md5(str(v).encode()).hexdigest()
        return sum(int(c, 16) * 16.0 ** -(i + 1) for i, c in enumerate(h[:8]))

    k = 32
    fa = sorted(frac(v) for v in range(500))
    fb = sorted(frac(v) for v in range(250, 750))
    fu = sorted(set(fa[:k]) | set(fb[:k]))
    want_a = round((k - 1) / fa[k - 1], 4)
    want_b = round((k - 1) / fb[k - 1], 4)
    want_u = round((k - 1) / fu[k - 1], 4)

    a = spark.createDataFrame([(i,) for i in range(500)], ["v"]).repartition(5)
    b = spark.createDataFrame([(i,) for i in range(250, 750)], ["v"]).repartition(3)
    r = sk.kmv_set_overlap(a, b, "v", k=k).collect()[0]
    assert r.est_a == pytest.approx(want_a, abs=1e-3)
    assert r.est_b == pytest.approx(want_b, abs=1e-3)
    assert r.est_union == pytest.approx(want_u, abs=1e-3)
    assert 0.0 <= r.jaccard_est <= 1.0


def test_kmv_overlap_disjoint_sets(spark):
    a = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(100, 110)], ["v"])
    r = sk.kmv_set_overlap(a, b, "v", k=64).collect()[0]
    assert r.est_intersection == pytest.approx(0.0)
    assert r.jaccard_est == pytest.approx(0.0)


def test_pagerank_empty_graph(spark):
    from amazon_security_lake_transformation_library_spark.operators import graph as g

    edges = spark.createDataFrame([], "src string, dst string, w double")
    out = g.pagerank(edges, iterations=3, weight_col="w")
    assert out.columns == ["node", "rank"]
    assert out.count() == 0
