"""Property tests for the round-5 second-wave operators.

* ``intervals.overlap_join`` must equal the brute-force cross product
  under ANY interval set and ANY bin width — including degenerate
  zero-length intervals, exact-touch endpoints (closed semantics), and
  intervals spanning many bins (the first-common-bin dedup rule must
  never double-emit or drop).
* ``curation.select_until_budget`` must equal the textbook global-window
  selection under ANY score/cost distribution and ANY budget — including
  heavy score ties (shared quantization buckets), zero costs, budgets
  landing exactly on a prefix-sum boundary, and bucket counts small
  enough that many distinct scores collide per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import curation as C
from amazon_security_lake_transformation_library_spark.operators import intervals as iv

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


@st.composite
def interval_sets(draw):
    n = draw(st.integers(1, 18))
    rows = []
    for i in range(n):
        start = draw(st.integers(0, 50_000))
        # zero-length, short, and multi-bin-spanning intervals all appear
        length = draw(st.sampled_from([0, 1, 59, 60, 3600, 90_000]))
        rows.append((i, start, start + length))
    return rows


@given(left=interval_sets(), right=interval_sets(),
       bin_seconds=st.sampled_from([60, 3600, 86_400]))
@settings(**_SETTINGS)
def test_overlap_join_equals_bruteforce(spark, left, right, bin_seconds):
    lp = pd.DataFrame(left, columns=["l_id", "ls", "le"])
    rp = pd.DataFrame(right, columns=["r_id", "rs", "re"])
    ldf = spark.createDataFrame(pd.DataFrame({
        "l_id": lp["l_id"],
        "l_start": pd.to_datetime(lp["ls"], unit="s").astype("datetime64[us]"),
        "l_end": pd.to_datetime(lp["le"], unit="s").astype("datetime64[us]"),
    }))
    rdf = spark.createDataFrame(pd.DataFrame({
        "r_id": rp["r_id"],
        "r_start": pd.to_datetime(rp["rs"], unit="s").astype("datetime64[us]"),
        "r_end": pd.to_datetime(rp["re"], unit="s").astype("datetime64[us]"),
    }))
    got = iv.overlap_join(ldf, rdf, "l_start", "l_end", "r_start", "r_end",
                          bin_seconds=bin_seconds).select("l_id", "r_id").collect()
    got_pairs = [(r["l_id"], r["r_id"]) for r in got]
    assert len(got_pairs) == len(set(got_pairs)), "double emission"
    expect = {
        (int(l.l_id), int(r.r_id))
        for l in lp.itertuples() for r in rp.itertuples()
        if l.ls <= r.re and r.rs <= l.le  # closed-interval overlap
    }
    assert set(got_pairs) == expect


@st.composite
def scored_corpora(draw):
    n = draw(st.integers(1, 60))
    # few distinct scores => heavy ties; integer costs incl. zero
    scores = draw(st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.2500001, 0.5, 0.75, 1.0]),
        min_size=n, max_size=n))
    costs = draw(st.lists(st.integers(0, 9), min_size=n, max_size=n))
    return scores, costs


@given(data=scored_corpora(),
       budget_frac=st.sampled_from([0.0, 0.3, 0.5, 1.0, 2.0]),
       n_buckets=st.sampled_from([4, 100, 100_000]))
@settings(**_SETTINGS)
def test_select_budget_equals_global_window(spark, data, budget_frac,
                                            n_buckets):
    scores, costs = data
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(scores)),
        "score": np.array(scores, dtype="float64"),
        "cost": np.array(costs, dtype="float64"),
    })
    budget = budget_frac * float(pdf["cost"].sum())
    df = spark.createDataFrame(pdf)
    got = {r["doc_id"] for r in C.select_until_budget(
        df, "score", "cost", budget, n_buckets=n_buckets)
        .select("doc_id").collect()}
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ref = {r["doc_id"] for r in df.withColumn("_c", F.sum("cost").over(w))
           .where(F.col("_c") <= F.lit(budget)).select("doc_id").collect()}
    assert got == ref
