"""Rolling quantile / strictly-past z-score / tumbling throttle
(operators/features.py): pandas differential, zero-leakage mutation
audit, and throttle invariants."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import features as feat


def _events(n_users=5, per_user=40, seed=7):
    rng = np.random.default_rng(seed)
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(n_users):
        t = t0
        for _ in range(per_user):
            t = t + datetime.timedelta(seconds=int(rng.integers(1, 4000)))
            rows.append((eid, u, t, float(rng.normal(10, 3))))
            eid += 1
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])


@pytest.fixture(scope="module")
def ev_pdf():
    return _events()


@pytest.fixture(scope="module")
def ev_df(spark, ev_pdf):
    return spark.createDataFrame(ev_pdf).repartition(6)


def test_rolling_quantile_matches_pandas(spark, ev_df, ev_pdf):
    out = feat.rolling_quantile(
        ev_df, "user_id", "ts", "value", q=0.5, n_preceding=9,
        tiebreak="event_id",
    ).toPandas().set_index("event_id")
    want = (
        ev_pdf.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["value"]
        .rolling(10, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    want.index = ev_pdf.sort_values(["user_id", "ts", "event_id"])["event_id"]
    for eid, w in want.items():
        assert out.loc[eid, "roll_q"] == pytest.approx(w), eid


def test_rolling_quantile_strict_past_first_row_null(spark, ev_df):
    out = feat.rolling_quantile(
        ev_df, "user_id", "ts", "value", strict_past=True,
        tiebreak="event_id",
    )
    firsts = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .where(F.col("rn") == 1)
        .collect()
    )
    assert all(r.roll_q is None for r in firsts)


def test_rolling_zscore_matches_pandas(spark, ev_df, ev_pdf):
    out = feat.rolling_zscore(
        ev_df, "user_id", "ts", "value", n_preceding=20, min_periods=5,
        tiebreak="event_id",
    ).toPandas().set_index("event_id")
    srt = ev_pdf.sort_values(["user_id", "ts", "event_id"])
    for u, grp in srt.groupby("user_id"):
        vals = grp["value"].to_numpy()
        for i in range(len(vals)):
            lo = max(0, i - 20)
            window = vals[lo:i]
            eid = grp["event_id"].iloc[i]
            got = out.loc[eid, "zscore"]
            if len(window) < 5 or np.std(window) == 0:
                assert pd.isna(got), eid
            else:
                want = (vals[i] - window.mean()) / np.std(window)
                assert got == pytest.approx(want, abs=1e-9), eid


def test_rolling_zscore_zero_leakage_mutation_audit(spark, ev_pdf):
    # mutate every value AFTER a probe row; the probe's zscore must not move
    probe_eid = 25  # mid-stream row of user 0
    base = spark.createDataFrame(ev_pdf)
    mutated_pdf = ev_pdf.copy()
    probe_row = mutated_pdf.loc[mutated_pdf.event_id == probe_eid].iloc[0]
    later = (mutated_pdf.user_id == probe_row.user_id) & (
        mutated_pdf.ts > probe_row.ts
    )
    mutated_pdf.loc[later, "value"] = 1e9
    mutated = spark.createDataFrame(mutated_pdf)
    z0 = {
        r.event_id: r.zscore
        for r in feat.rolling_zscore(
            base, "user_id", "ts", "value", tiebreak="event_id"
        ).where(F.col("event_id") == probe_eid).collect()
    }
    z1 = {
        r.event_id: r.zscore
        for r in feat.rolling_zscore(
            mutated, "user_id", "ts", "value", tiebreak="event_id"
        ).where(F.col("event_id") == probe_eid).collect()
    }
    assert z0 == z1


def test_throttle_keeps_first_per_bucket(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # three events in one hour bucket -> keep earliest (eid 1)
        (1, 7, "click", t0 + datetime.timedelta(minutes=1)),
        (2, 7, "click", t0 + datetime.timedelta(minutes=30)),
        (3, 7, "click", t0 + datetime.timedelta(minutes=59)),
        # next hour bucket -> kept
        (4, 7, "click", t0 + datetime.timedelta(minutes=61)),
        # different type same bucket -> kept
        (5, 7, "view", t0 + datetime.timedelta(minutes=2)),
        # different user same bucket -> kept
        (6, 8, "click", t0 + datetime.timedelta(minutes=3)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    kept = {
        r.event_id
        for r in feat.throttle_events(
            df, "user_id", "ts", 3600, by=["event_type"], tiebreak="event_id"
        ).collect()
    }
    assert kept == {1, 4, 5, 6}


def test_throttle_partitioning_invariant(spark, ev_df):
    a = feat.throttle_events(
        ev_df.coalesce(1), "user_id", "ts", 3600, tiebreak="event_id"
    )
    b = feat.throttle_events(
        ev_df.repartition(11), "user_id", "ts", 3600, tiebreak="event_id"
    )
    assert sorted(r.event_id for r in a.collect()) == sorted(
        r.event_id for r in b.collect()
    )
