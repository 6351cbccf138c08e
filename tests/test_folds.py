"""CV fold assignment (operators/folds.py): grouped-fold constancy,
determinism under partitioning, expanding-window no-future-leak
property, and plan shape (zero corpus shuffle)."""

import datetime

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import folds as fld


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [(i, _ts(i), i % 7) for i in range(100)]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def test_kfold_is_group_constant_and_total(spark, ev):
    out = fld.kfold_assign(ev, "user_id", k=4)
    per_user = out.groupBy("user_id").agg(
        F.count_distinct("fold").alias("nf")
    ).collect()
    assert all(r.nf == 1 for r in per_user)
    folds = {r.fold for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(4)) and len(folds) > 1


def test_kfold_invariant_under_partitioning_and_salted(spark, ev):
    a = {r.event_id: r.fold for r in fld.kfold_assign(ev, "user_id", k=5).collect()}
    b = {r.event_id: r.fold
         for r in fld.kfold_assign(ev.repartition(13), "user_id", k=5).collect()}
    assert a == b
    c = {r.event_id: r.fold
         for r in fld.kfold_assign(ev, "user_id", k=5, salt="other").collect()}
    assert a != c  # salt re-rolls


def test_kfold_rejects_k_below_2(spark, ev):
    with pytest.raises(ValueError):
        fld.kfold_assign(ev, "user_id", k=1)


def test_tscv_segments_are_time_ordered(spark, ev):
    out = fld.tscv_segment(ev, "ts", n_splits=3).collect()
    # segment must be monotone in ts: a later event never has a lower segment
    by_ts = sorted(out, key=lambda r: r.ts)
    segs = [r.segment for r in by_ts]
    assert segs == sorted(segs)
    assert set(segs) == {0, 1, 2, 3}


def test_tscv_folds_never_leak_future_into_train(spark, ev):
    folds = fld.tscv_folds(ev, "ts", n_splits=3)
    seg = {r.event_id: r.segment
           for r in fld.tscv_segment(ev, "ts", 3).collect()}
    for r in folds.collect():
        s = seg[r.event_id]
        if r.role == "train":
            assert s < r.split_id  # strictly before the test slice
        else:
            assert s == r.split_id
    # split 1 must not contain any row from segments 2..3 at all
    s1 = folds.filter("split_id = 1")
    assert s1.filter(F.col("event_id").isin(
        [k for k, v in seg.items() if v > 1])).count() == 0


def test_tscv_plan_has_no_corpus_shuffle(spark, ev):
    out = fld.tscv_segment(ev.repartition(7), "ts", n_splits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if (
            "Exchange" in line
            and "SinglePartition" not in line
            and "BroadcastExchange" not in line
            and "REPARTITION_BY_NUM" not in line
        ):
            raise AssertionError(f"corpus shuffle in plan: {line.strip()}")
