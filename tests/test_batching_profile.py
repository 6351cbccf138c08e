"""Length-bucketed batch assignment (datasetops.length_bucket_batches)
and the one-pass column profiler (profiling.column_profile)."""

import datetime

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import datasetops as dso
from amazon_security_lake_transformation_library_spark.operators import profiling as prof


@pytest.fixture(scope="module")
def docs_df(spark):
    # lengths 1..200: quartile buckets of 50 docs each
    rows = [(i, i) for i in range(1, 201)]
    return spark.createDataFrame(rows, ["doc_id", "n_chars"]).repartition(7)


def test_length_batches_shape_and_determinism(spark, docs_df):
    out = dso.length_bucket_batches(
        docs_df, n_buckets=4, batch_rows=16
    ).collect()
    assert len(out) == 200
    by_bucket = {}
    for r in out:
        assert r.batch_id is not None
        by_bucket.setdefault(r.bucket, set()).add(r.batch_id)
    # 4 buckets x ceil(50/16)=4 batches, globally dense ids 0..15
    assert set(by_bucket) == {0, 1, 2, 3}
    all_ids = sorted(set().union(*by_bucket.values()))
    assert all_ids == list(range(16))
    # batch id ranges are disjoint and ordered by bucket
    for b in range(3):
        assert max(by_bucket[b]) < min(by_bucket[b + 1])
    # deterministic under repartitioning
    again = {
        (r.doc_id, r.batch_id)
        for r in dso.length_bucket_batches(
            docs_df.repartition(3), n_buckets=4, batch_rows=16
        ).collect()
    }
    assert again == {(r.doc_id, r.batch_id) for r in out}


def test_length_batches_same_bucket_similar_lengths(spark, docs_df):
    out = dso.length_bucket_batches(docs_df, n_buckets=4, batch_rows=16)
    joined = out.join(docs_df, "doc_id")
    spans = (
        joined.groupBy("batch_id")
        .agg((F.max("n_chars") - F.min("n_chars")).alias("span"))
        .collect()
    )
    # any batch spans at most one quartile (50 lengths)
    assert all(r.span <= 50 for r in spans)


def test_column_profile_values(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "a", 1.0, t0),
        (2, "b", 3.0, t0 + datetime.timedelta(seconds=10)),
        (3, None, None, t0 + datetime.timedelta(seconds=20)),
        (3, "a", 4.0, None),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, s string, v double, ts timestamp"
    )
    out = {r.column: r for r in prof.column_profile(df).collect()}
    assert set(out) == {"id", "s", "v", "ts"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["id"].n_nulls == 0 and out["id"].n_distinct == 3
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].min_num is None and out["s"].mean is None
    assert out["v"].mean == pytest.approx(round(8.0 / 3, 4))
    assert out["v"].min_num == 1.0 and out["v"].max_num == 4.0
    assert out["ts"].n_nulls == 1
    assert out["ts"].min_num == pytest.approx(1704067200000000.0)
    assert out["ts"].max_num == pytest.approx(1704067220000000.0)
    assert out["ts"].mean is None  # temporal mean suppressed (2^53 rule)
