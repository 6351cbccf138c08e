"""Hashing trick + bounded-vocab multi-hot (operators/vectorize.py).
The gate queries pin both against DuckDB; these tests cover collision
merging, NULL features, vocabulary determinism under ties, OOV
accounting, and plan shape (hashing must never shuffle)."""

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import vectorize as vz


def test_hash_rows_skip_nulls_and_stay_in_range(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "b", None)],
        "id long, c1 string, c2 long",
    )
    out = vz.hash_feature_rows(df, "id", ["c1", "c2"], dim=16).collect()
    # row 2 contributes only c2, row 3 only c1
    per_id = {}
    for r in out:
        per_id.setdefault(r.id, []).append(r.feature)
        assert 0 <= r.idx < 16
        assert r.sign in (1, -1)
    assert sorted(per_id[1]) == ["c1", "c2"]
    assert per_id[2] == ["c2"] and per_id[3] == ["c1"]


def test_vec_merges_collisions_like_groupby(spark):
    # dim=2 forces collisions; the in-row fold must equal an actual
    # group-by over the exploded stream, INCLUDING cancelled (val=0) slots
    df = spark.createDataFrame(
        [(i, f"v{i % 5}", i % 3) for i in range(50)],
        "id long, c1 string, c2 long",
    )
    vec = vz.hash_features_vec(df, "id", ["c1", "c2"], dim=2)
    exploded = vec.select("id", F.explode("features").alias("e")).select(
        "id", F.col("e.idx").alias("idx"), F.col("e.val").alias("val")
    )
    manual = (
        vz.hash_feature_rows(df, "id", ["c1", "c2"], dim=2)
        .groupBy("id", "idx").agg(F.sum("sign").cast("long").alias("val"))
    )
    assert exploded.exceptAll(manual).count() == 0
    assert manual.exceptAll(exploded).count() == 0


def test_hash_rows_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a")], "id long, c1 string").repartition(3)
    out = vz.hash_feature_rows(df, "id", ["c1"], dim=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "REPARTITION_BY_NUM" not in line:
            raise AssertionError(f"shuffle in hashing plan: {line.strip()}")


def test_vocab_rank_is_deterministic_under_freq_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    v = {r.token: (r.vocab_idx, r.doc_freq)
         for r in vz.build_vocab(docs, top_v=10).collect()}
    # a and b tie at df=2 -> token-ascending tie-break
    assert v["a"] == (0, 2) and v["b"] == (1, 2) and v["c"] == (2, 1)


def test_multihot_counts_oov_on_distinct_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "a a zz zz qq"), (2, "b")], "doc_id long, text string"
    )
    vocab = vz.build_vocab(
        spark.createDataFrame([(9, "a b")], "doc_id long, text string"),
        top_v=10,
    )
    out = {r.doc_id: r for r in vz.encode_multihot(docs, vocab).collect()}
    # doc 1: distinct tokens {a, zz, qq}; only a in vocab -> 2 OOV
    assert out[1].idxs == [0] and out[1].n_oov == 2
    assert out[2].idxs == [1] and out[2].n_oov == 0
