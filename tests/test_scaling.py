"""Leakage-safe feature scaling (operators/scaling.py): temporal
cutoff, single-pass fit statistics, broadcast transforms. The gate
query covers the happy path against DuckDB; these tests cover the
degenerate and adversarial cases the fixture cannot reach (NULL
values, zero variance, serve-slice leakage probes)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import scaling as scl


def _ts(day: int, sec: int = 0):
    return datetime.datetime(2024, 1, day, 0, 0, sec)


@pytest.fixture(scope="module")
def ev_df(spark):
    # 10 days, one row/day, values 10..100; day 10 (serve slice under
    # frac<=0.9) carries an extreme outlier to probe leakage.
    rows = [(i, _ts(i), float(i * 10)) for i in range(1, 10)]
    rows.append((10, _ts(10), 1e9))
    return spark.createDataFrame(rows, ["event_id", "ts", "value"]).repartition(5)


def test_cutoff_is_exact_quantile(spark, ev_df):
    cut = scl.temporal_cutoff(ev_df, "ts", 1.0).collect()[0]
    assert cut.cutoff_us == ev_df.agg(
        F.max(F.unix_micros("ts").cast("double"))
    ).collect()[0][0]


def test_serve_slice_never_reaches_fit(spark, ev_df):
    # frac such that the 1e9 outlier sits strictly past the cutoff
    out = scl.fit_transform_temporal(
        ev_df, "ts", "value", train_frac=0.8
    ).collect()
    by_id = {r.event_id: r for r in out}
    # quantile(0.8) of 10 stamps interpolates between day 8 and day 9:
    # train = days 1..8, serve = days 9..10
    assert by_id[8].is_train and not by_id[9].is_train
    assert not by_id[10].is_train
    # minmax of a TRAIN row is computed against the train max (80), so
    # a leaked 1e9 would crush every train value toward 0
    assert by_id[8].v_minmax == pytest.approx(1.0)
    # the serve outlier winsorizes to the train p99, not to itself
    assert by_id[10].v_winsor < 100.0
    # and its minmax goes far above 1 (scaled with train stats, as a
    # serving-time pass must)
    assert by_id[10].v_minmax > 100.0


def test_null_values_stay_null_everywhere(spark):
    rows = [(1, _ts(1), 1.0), (2, _ts(2), 3.0), (3, _ts(3), None)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = scl.fit_transform_temporal(df, "ts", "value", train_frac=1.0)
    r = {x.event_id: x for x in out.collect()}[3]
    for c in ("v_std", "v_minmax", "v_robust", "v_winsor", "v_bin"):
        assert getattr(r, c) is None, c


def test_zero_variance_encodes_constant_zero(spark):
    rows = [(i, _ts(i), 7.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = scl.fit_transform_temporal(df, "ts", "value", train_frac=1.0).collect()
    for r in out:
        assert r.v_std == 0.0
        assert r.v_minmax == 0.0
        assert r.v_robust == 0.0
        assert r.v_winsor == 7.0
        assert r.v_bin == 0
        assert all(not (isinstance(v, float) and math.isnan(v)) for v in r)


def test_bin_is_total_and_monotone(spark, ev_df):
    out = scl.fit_transform_temporal(ev_df, "ts", "value", train_frac=0.8)
    rows = sorted(out.collect(), key=lambda r: r.event_id)
    bins = [r.v_bin for r in rows]
    assert all(b in (0, 1, 2, 3) for b in bins)
    # values increase with event_id, so bins must be non-decreasing
    assert bins == sorted(bins)
    assert bins[0] == 0 and bins[-1] == 3


def test_transform_matches_manual_stats(spark, ev_df):
    train = ev_df.filter(F.col("event_id") <= 8)
    stats = scl.fit_scaler_stats(train, "value").collect()[0]
    out = {
        r.event_id: r
        for r in scl.apply_scalers(ev_df, "value", scl.fit_scaler_stats(train, "value")).collect()
    }
    v = 50.0  # event 5
    assert out[5].v_std == pytest.approx((v - stats.mean) / stats.std)
    assert out[5].v_minmax == pytest.approx((v - stats.vmin) / (stats.vmax - stats.vmin))
    assert out[5].v_robust == pytest.approx((v - stats.med) / (stats.q3 - stats.q1))


def test_grouped_matches_per_group_manual(spark):
    rows = [
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
        (5, "b", 10.0), (6, "b", 30.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, g string, value double")
    stats = scl.fit_scaler_stats_grouped(df, "g", "value")
    out = {r.event_id: r for r in
           scl.apply_scalers_grouped(df, "g", "value", stats).collect()}
    # group a: mean 2.5, std stddev_samp([1..4]) = sqrt(5/3)
    assert out[3].v_std == pytest.approx((3.0 - 2.5) / math.sqrt(5 / 3))
    assert out[3].v_minmax == pytest.approx((3.0 - 1.0) / 3.0)
    # group b scales against ITS OWN stats, not a's
    assert out[6].v_minmax == pytest.approx(1.0)


def test_grouped_unseen_group_scales_to_null(spark):
    fit = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "event_id long, g string, value double"
    )
    apply_df = spark.createDataFrame(
        [(3, "a", 1.5), (4, "zz", 9.0)], "event_id long, g string, value double"
    )
    stats = scl.fit_scaler_stats_grouped(fit, "g", "value")
    out = {r.event_id: r for r in
           scl.apply_scalers_grouped(apply_df, "g", "value", stats).collect()}
    # group zz never fit: every scaled column must be NULL, never a
    # silent fall-through to another group's statistics
    for c in ("v_std", "v_minmax", "v_robust", "v_winsor"):
        assert getattr(out[4], c) is None, c
        assert getattr(out[3], c) is not None, c


def test_grouped_plan_broadcasts_stats(spark):
    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, g string, value double").repartition(5)
    stats = scl.fit_scaler_stats_grouped(df, "g", "value")
    out = scl.apply_scalers_grouped(df, "g", "value", stats)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join: the corpus side must not shuffle for the join
    assert "SortMergeJoin" not in plan


def test_plan_has_no_shuffle(spark, ev_df):
    out = scl.fit_transform_temporal(ev_df, "ts", "value", train_frac=0.8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Exchanges allowed are the 1-row single-partition agg
    # reductions (fit + cutoff), their broadcasts, and the fixture's own
    # repartition(5); the operator itself must never shuffle the corpus
    for line in plan.splitlines():
        if (
            "Exchange" in line
            and "SinglePartition" not in line
            and "BroadcastExchange" not in line
            and "REPARTITION_BY_NUM" not in line
        ):
            raise AssertionError(f"corpus shuffle in plan: {line.strip()}")
