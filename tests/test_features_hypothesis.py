"""Property-based window-feature testing: random tiny frames with
adversarial ordering structure — duplicate timestamps, singleton entities,
all-null tool runs, gap values straddling the session threshold — must
match a direct pandas recomputation of sessionize + forward-fill +
lag/lead + cumulative counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_security_lake_transformation_library_spark.operators.features import (
    build_turn_features,
)

GAP_S = 1800


@st.composite
def frames(draw):
    n = draw(st.integers(1, 30))
    convs = draw(st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n))
    # gap choices include exactly-threshold (1800 -> NOT a new session under
    # the strict > rule) and threshold+1
    gaps = draw(st.lists(st.sampled_from([0, 1, 60, GAP_S, GAP_S + 1, 7200]),
                         min_size=n, max_size=n))
    tools = draw(st.lists(st.one_of(st.none(), st.sampled_from(["t1", "t2"])),
                          min_size=n, max_size=n))
    roles = draw(st.lists(st.sampled_from(["user", "assistant", "tool"]),
                          min_size=n, max_size=n))
    rows = []
    counters: dict[str, int] = {}
    offsets: dict[str, float] = {}
    for conv, gap, tool, role in zip(convs, gaps, tools, roles):
        idx = counters.get(conv, 0)
        counters[conv] = idx + 1
        offsets[conv] = offsets.get(conv, 0.0) + gap
        rows.append((conv, idx, role,
                     f"{conv} text {idx}", tool,
                     pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=offsets[conv])))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def _pandas_features(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for conv, g in pdf.sort_values(["conv_id", "ts", "turn_idx"]).groupby("conv_id"):
        g = g.reset_index(drop=True)
        prev_ts = g["ts"].shift(1)
        gap = (g["ts"] - prev_ts).dt.total_seconds()
        flag = (prev_ts.isna() | (gap > GAP_S)).astype(int)
        g["session_id"] = flag.cumsum() - 1
        g["tool_ffill"] = g["tool"].ffill()
        g["prev_role"] = g["role"].shift(1)
        g["next_role"] = g["role"].shift(-1)
        g["user_turn_cum"] = (g["role"] == "user").astype(int).cumsum()
        out.append(g)
    return pd.concat(out).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pdf=frames())
def test_turn_features_match_pandas(spark, pdf):
    got = (
        build_turn_features(spark.createDataFrame(pdf), gap_seconds=GAP_S)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _pandas_features(pdf)
    np.testing.assert_array_equal(got["session_id"], want["session_id"])
    np.testing.assert_array_equal(got["user_turn_cum"], want["user_turn_cum"])
    assert got["tool_ffill"].fillna("∅").tolist() == want["tool_ffill"].fillna("∅").tolist()
    assert got["prev_role"].fillna("∅").tolist() == want["prev_role"].fillna("∅").tolist()
    assert got["next_role"].fillna("∅").tolist() == want["next_role"].fillna("∅").tolist()
