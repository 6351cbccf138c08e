"""Feature-parity tests (SURVEY.md §5.2 item 3): Spark window features vs
the pure-pandas oracle — allclose per (conv_id, turn_idx, ts), text
byte-equal under stable (conv_id, turn_idx) ordering.
"""

import numpy as np
import pandas as pd

from amazon_security_lake_transformation_library_spark.operators.features import (
    build_turn_features,
    forward_fill,
    sessionize,
    with_lag_lead,
)
from amazon_security_lake_transformation_library_spark.oracle import pandas_oracle as ora

from conftest import spark_to_pandas_sorted

KEYS = ["conv_id", "turn_idx"]


def test_flagship_turn_features_match_oracle(spark, transcripts_df, transcripts_pdf):
    got = spark_to_pandas_sorted(build_turn_features(transcripts_df), KEYS)
    want = (
        ora.turn_features(transcripts_pdf)
        .sort_values(KEYS, kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)

    # text byte-equality under stable (conv_id, turn_idx) order
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()

    for col in ["text_len", "n_tokens", "session_id", "user_turn_cum"]:
        np.testing.assert_allclose(
            got[col].to_numpy(dtype="float64"),
            want[col].to_numpy(dtype="float64"),
            err_msg=col,
        )
    for col in ["prev_role", "next_role", "tool_ffill"]:
        pd.testing.assert_series_equal(
            got[col].astype("object"),
            want[col].astype("object").where(want[col].notna(), None),
            check_names=False,
        )
    np.testing.assert_allclose(
        got["prev_text_len"].to_numpy(dtype="float64"),
        want["prev_text_len"].to_numpy(dtype="float64"),
    )


def test_first_last_rows_null_lag_lead(spark, transcripts_df):
    got = spark_to_pandas_sorted(
        with_lag_lead(transcripts_df, {"role": transcripts_df.role}), KEYS
    )
    first = got.groupby("conv_id").head(1)
    last = got.groupby("conv_id").tail(1)
    assert first["prev_role"].isna().all()
    assert last["next_role"].isna().all()


def test_forward_fill_spans_session_boundaries(spark, transcripts_df, transcripts_pdf):
    got = spark_to_pandas_sorted(forward_fill(transcripts_df, ["tool"]), KEYS)
    want = ora.turn_features(transcripts_pdf).sort_values(KEYS, kind="mergesort")
    g = got["tool_ffill"].where(got["tool_ffill"].notna(), None).tolist()
    w = want["tool_ffill"].where(want["tool_ffill"].notna(), None).tolist()
    assert g == w


def test_sessionize_gap_rule(spark, transcripts_df, transcripts_pdf):
    got = spark_to_pandas_sorted(sessionize(transcripts_df, gap_seconds=1800), KEYS)
    want = ora.sessionize(
        transcripts_pdf, entity="conv_id", gap_seconds=1800, order=["ts", "turn_idx"]
    ).sort_values(KEYS, kind="mergesort")
    np.testing.assert_array_equal(
        got["session_id"].to_numpy(), want["session_id"].to_numpy()
    )
    # fixture must actually exercise multi-session convs
    assert want.groupby("conv_id")["session_id"].max().max() >= 3


def test_single_window_node_in_plan(spark, transcripts_df):
    """The whole flagship feature block must cost ONE shuffle + ONE sort.
    (Two pipelined Window nodes are expected: sum(session_flag) depends on
    lag(ts), a two-level window dependency — but both share the same
    partitioning+ordering so no re-exchange / re-sort happens.)"""
    plan = build_turn_features(transcripts_df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("+- Sort") == 1, plan


# ------------------------------------------------ time-decayed EWMA features

def _ewma_fixture(spark, day_span: float, n_users: int = 5, n_rows: int = 400):
    """Deterministic irregular-timestamp events over `day_span` days."""
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "event_id": np.arange(n_rows),
        "user_id": rng.integers(0, n_users, n_rows),
        "ts": base + pd.to_timedelta(
            np.sort(rng.uniform(0, day_span * 86400, n_rows)), unit="s"),
        "value": rng.normal(10, 3, n_rows).round(3),
    })
    return spark.createDataFrame(pdf), pdf


def test_ewma_jvm_and_grouped_agree_and_match_pandas(spark):
    from amazon_security_lake_transformation_library_spark.operators.features import (
        ewma_time_decay, ewma_time_decay_grouped)

    sdf, pdf = _ewma_fixture(spark, day_span=30)
    hl = 3 * 86400.0
    jvm = {r["event_id"]: r["ewma"] for r in ewma_time_decay(
        sdf, "user_id", "ts", "value", hl, order_tiebreak="event_id").collect()}
    grp = {r["event_id"]: r["ewma"] for r in ewma_time_decay_grouped(
        sdf, "user_id", "ts", "value", hl, order_tiebreak="event_id").collect()}
    # independent pandas oracle
    want = {}
    for _, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        e = g["value"].ewm(halflife=pd.Timedelta(seconds=hl),
                           times=pd.DatetimeIndex(g["ts"])).mean()
        want.update(dict(zip(g["event_id"], e)))
    for k, w in want.items():
        assert abs(jvm[k] - w) < 1e-8, k
        assert abs(grp[k] - w) < 1e-8, k


def test_ewma_overflow_envelope_grouped_survives_jvm_does_not(spark):
    """The documented trade: the JVM cancellation form overflows once an
    entity spans ~1000+ halflives; the applyInPandas renormalizing scan
    stays finite. This pins WHY both implementations exist."""
    from amazon_security_lake_transformation_library_spark.operators.features import (
        ewma_time_decay, ewma_time_decay_grouped)

    # 2000 days at a 1-hour halflife = 48,000 halflives >> envelope
    sdf, _ = _ewma_fixture(spark, day_span=2000, n_users=1, n_rows=50)
    hl = 3600.0
    jvm = [r["ewma"] for r in ewma_time_decay(
        sdf, "user_id", "ts", "value", hl).collect()]
    grp = [r["ewma"] for r in ewma_time_decay_grouped(
        sdf, "user_id", "ts", "value", hl).collect()]
    assert any(v is None or not np.isfinite(v) for v in jvm)  # overflowed
    assert all(v is not None and np.isfinite(v) for v in grp)  # stable


def test_ewma_plan_shapes(spark):
    from amazon_security_lake_transformation_library_spark.operators.features import (
        ewma_time_decay, ewma_time_decay_grouped)

    sdf, _ = _ewma_fixture(spark, day_span=30)
    jvm_plan = ewma_time_decay(
        sdf, "user_id", "ts", "value", 1000.0
    )._jdf.queryExecution().executedPlan().toString()
    # both running sums + the first_value share ONE exchange+sort window
    assert jvm_plan.count("Exchange") == 1
    assert "Python" not in jvm_plan
    grp_plan = ewma_time_decay_grouped(
        sdf, "user_id", "ts", "value", 1000.0
    )._jdf.queryExecution().executedPlan().toString()
    assert grp_plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in grp_plan
