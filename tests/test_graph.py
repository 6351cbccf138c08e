"""Tests for connected components / dedup cluster resolution (graph.py).

Python oracle: union-find over the same edge list."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import graph as g


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    )


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 4)],                      # path
        [(1, 2), (3, 4), (5, 6), (6, 3)],              # two components
        [(10, 20), (20, 10), (10, 10)],                # dup + self edges
        [(7, 3), (9, 2), (2, 7)],                      # min id not an endpoint ordering
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    out = g.connected_components(_edges_df(spark, edges)).toPandas()
    expect = _uf_components(edges)
    got = dict(zip(out["n"], out["component"]))
    assert got == expect


def test_long_chain_converges_logarithmically(spark):
    # 200-node path: naive one-hop propagation needs ~200 rounds; pointer
    # jumping must resolve it inside the default max_iters=25 (~log2 200).
    edges = [(i, i + 1) for i in range(200)]
    out = g.connected_components(_edges_df(spark, edges)).toPandas()
    assert set(out["component"]) == {0}
    assert len(out) == 201


def test_dedup_clusters_keep_is_canonical(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = _edges_df(spark, [(1, 2), (2, 5), (7, 8)])
    out = g.dedup_clusters(docs, pairs).toPandas().set_index("doc_id")
    # every doc present exactly once
    assert sorted(out.index) == list(range(10))
    # component {1,2,5} -> 1, {7,8} -> 7, rest singleton
    for d in range(10):
        expect = 1 if d in (1, 2, 5) else (7 if d in (7, 8) else d)
        assert out.loc[d, "cluster_id"] == expect, d
    # exactly one keep per cluster, and it's the minimum member
    keeps = out[out["keep"]]
    assert sorted(keeps.index) == sorted(out["cluster_id"].unique())
    assert out.groupby("cluster_id")["keep"].sum().eq(1).all()


def test_empty_pairs_all_singletons(spark):
    docs = spark.range(0, 5).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = g.dedup_clusters(docs, empty).toPandas()
    assert (out["cluster_id"] == out["doc_id"]).all()
    assert out["keep"].all()
