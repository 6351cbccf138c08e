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
