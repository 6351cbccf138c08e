"""Encoders: ordered target statistics, frequency encoding, group
z-score, mutual information.

Each Spark result is checked against an independent pure-python/pandas
re-derivation; the ordered target encoder additionally gets the leakage
probes that define it: a row's own label never moves its encoding,
equal-timestamp peers are excluded, and the first row of a category
gets exactly the prior."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import encoders as E


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "cat", "ts", "y"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="mixed")
    return spark.createDataFrame(pdf)


# ---------------------------------------------------- target_encode_ordered


def test_target_encode_first_row_gets_prior_and_strict_past(spark):
    rows = [
        (0, "a", "2024-01-01 00:00:00", 1),
        (1, "a", "2024-01-01 01:00:00", 0),
        (2, "a", "2024-01-01 02:00:00", 1),
        (3, "b", "2024-01-01 00:30:00", 1),
    ]
    out = (
        E.target_encode_ordered(
            _ev(spark, rows), "cat", F.col("y") == 1, "ts", prior=0.5, m=2.0
        )
        .orderBy("event_id")
        .collect()
    )
    # row 0: no past -> te = (0 + 2*0.5) / (0 + 2) = 0.5 (exactly the prior)
    assert out[0]["te_n"] == 0 and out[0]["te"] == pytest.approx(0.5)
    # row 1: past = {y=1} -> (1 + 1) / (1 + 2)
    assert out[1]["te"] == pytest.approx(2 / 3)
    # row 2: past = {1, 0} -> (1 + 1) / (2 + 2)
    assert out[2]["te"] == pytest.approx(0.5)
    # category b unaffected by a's rows
    assert out[3]["te_n"] == 0 and out[3]["te"] == pytest.approx(0.5)


def test_target_encode_equal_ts_peers_excluded(spark):
    # two rows at the identical timestamp: neither sees the other (or
    # itself) — the zero-lookahead boundary is strict
    rows = [
        (0, "a", "2024-01-01 00:00:00", 1),
        (1, "a", "2024-01-01 00:00:00", 1),
        (2, "a", "2024-01-01 00:00:01", 0),
    ]
    out = (
        E.target_encode_ordered(
            _ev(spark, rows), "cat", F.col("y") == 1, "ts", prior=0.0, m=1.0
        )
        .orderBy("event_id")
        .collect()
    )
    assert out[0]["te_n"] == 0 and out[1]["te_n"] == 0
    assert out[2]["te_n"] == 2 and out[2]["te"] == pytest.approx(2 / 3)


def test_target_encode_own_label_never_moves_encoding(spark):
    # flipping a row's own label must not change that row's te
    base = [(i, "a", f"2024-01-01 00:00:{i:02d}", i % 2) for i in range(10)]
    flipped = [(i, c, t, 1 - y if i == 7 else y) for (i, c, t, y) in base]
    te_b = (
        E.target_encode_ordered(
            _ev(spark, base), "cat", F.col("y") == 1, "ts", prior=0.5
        )
        .filter(F.col("event_id") == 7)
        .collect()[0]["te"]
    )
    te_f = (
        E.target_encode_ordered(
            _ev(spark, flipped), "cat", F.col("y") == 1, "ts", prior=0.5
        )
        .filter(F.col("event_id") == 7)
        .collect()[0]["te"]
    )
    assert te_b == pytest.approx(te_f)


def test_target_encode_matches_pandas_and_partitioning_invariant(spark):
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "cat": rng.choice(list("abcde"), n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "y": rng.integers(0, 2, n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        E.target_encode_ordered(
            df.repartition(13), "cat", F.col("y") == 1, "ts", prior=0.3, m=5.0
        )
        .select("event_id", "te")
        .toPandas()
        .set_index("event_id")["te"]
        .sort_index()
    )
    # independent derivation: per row, same-cat strictly-earlier rows
    exp = {}
    for _, r in pdf.iterrows():
        past = pdf[(pdf.cat == r["cat"]) & (pdf.ts < r.ts)]
        exp[r.event_id] = (past.y.sum() + 5.0 * 0.3) / (len(past) + 5.0)
    exp = pd.Series(exp).sort_index()
    assert np.allclose(out.values, exp.values)


# --------------------------------------------------------- frequency_encode


def test_frequency_encode_matches_value_counts(spark):
    pdf = pd.DataFrame({"id": range(100), "cat": [f"c{i % 7}" for i in range(100)]})
    out = (
        E.frequency_encode(spark.createDataFrame(pdf), "cat")
        .select("id", "freq_n", "freq")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    vc = pdf.cat.value_counts()
    for i, c in enumerate(pdf.cat):
        assert out.loc[i, "freq_n"] == vc[c]
        assert out.loc[i, "freq"] == pytest.approx(vc[c] / 100.0)


def test_frequency_and_zscore_keep_null_groups(spark):
    # NULL category rows must survive the join-back as their own group
    pdf = pd.DataFrame(
        {
            "id": range(6),
            "cat": ["a", "a", None, None, None, "b"],
            "v": [1.0, 3.0, 10.0, 20.0, 30.0, 5.0],
        }
    )
    df = spark.createDataFrame(pdf)
    fr = E.frequency_encode(df, "cat").orderBy("id").collect()
    assert len(fr) == 6
    assert [r["freq_n"] for r in fr] == [2, 2, 3, 3, 3, 1]
    zs = E.zscore_by_group(df, "v", ["cat"]).orderBy("id").collect()
    assert len(zs) == 6
    # NULL group mean 20, pop std sqrt(200/3)
    import math as _m

    s = _m.sqrt(200.0 / 3.0)
    assert zs[2]["z"] == pytest.approx(-10.0 / s)
    assert zs[5]["z"] == 0.0  # singleton group


# ----------------------------------------------------------- zscore_by_group


def test_zscore_matches_pandas_and_degenerate_group(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "id": range(90),
            "g": [f"g{i % 3}" for i in range(90)],
            "v": rng.normal(10, 4, 90),
        }
    )
    # one extra single-row group (std == 0) must encode to 0.0
    pdf = pd.concat(
        [pdf, pd.DataFrame({"id": [90], "g": ["solo"], "v": [42.0]})],
        ignore_index=True,
    )
    out = (
        E.zscore_by_group(spark.createDataFrame(pdf), "v", ["g"])
        .select("id", "z")
        .toPandas()
        .set_index("id")["z"]
        .sort_index()
    )
    exp = pdf.groupby("g")["v"].transform(
        lambda s: (s - s.mean()) / s.std(ddof=0) if s.std(ddof=0) > 0 else 0.0
    )
    assert np.allclose(out.values, exp.values)
    assert out[90] == 0.0


# -------------------------------------------------------- mutual_information


def test_mutual_information_matches_manual_and_entropy_identity(spark):
    rng = np.random.default_rng(11)
    x = rng.choice(["p", "q", "r"], 600)
    # y correlated with x
    y = np.where(rng.random(600) < 0.7, x == "p", rng.random(600) < 0.5)
    pdf = pd.DataFrame({"x": x, "y": y.astype(int)})
    df = spark.createDataFrame(pdf)
    mi = E.mutual_information(df, F.col("x"), F.col("y")).collect()[0]["mi"]

    joint = pdf.groupby(["x", "y"]).size() / len(pdf)
    px = pdf.x.value_counts(normalize=True)
    py = pdf.y.value_counts(normalize=True)
    exp = sum(
        p * math.log(p / (px[a] * py[b])) for (a, b), p in joint.items()
    )
    assert mi == pytest.approx(exp, rel=1e-9)
    assert mi > 0.0

    # MI(x, x) == H(x)
    mi_xx = E.mutual_information(df, F.col("x"), F.col("x")).collect()[0]["mi"]
    h = -sum(p * math.log(p) for p in px.values)
    assert mi_xx == pytest.approx(h, rel=1e-9)
