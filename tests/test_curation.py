"""Curation operators: forward-horizon labels, per-group top-N sampling,
domain mixture weights, DSIR importance scores, PSI drift.

Each Spark result is checked against an independent pure-python/pandas
re-derivation, plus the invariants that matter at scale: the label
frame's strict-future boundary (the leakage contract), determinism of
the sampled set under repartitioning, mixture weight normalization, and
PSI's grid completeness when one side leaves a bin empty."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import curation as C


# ----------------------------------------------------------- label_horizon

def _events_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="mixed")
    return spark.createDataFrame(pdf)


def test_label_horizon_strict_future_boundary(spark):
    rows = [
        # u1: purchase exactly AT t0 must NOT label t0 (peers excluded);
        # purchase at t0+3600s exactly IS inside [1us, 3600s] -> labels t0
        (0, "u1", "2024-01-01 00:00:00", "view"),
        (1, "u1", "2024-01-01 00:00:00", "purchase"),
        (2, "u1", "2024-01-01 01:00:00", "purchase"),
        # u2: purchase 1us past the horizon -> outside
        (3, "u2", "2024-01-01 00:00:00", "view"),
        (4, "u2", "2024-01-01 01:00:00.000001", "purchase"),
        # u3: no future purchase
        (5, "u3", "2024-01-01 00:00:00", "view"),
    ]
    df = _events_df(spark, rows)
    out = {
        r["event_id"]: (r["label_n"], r["label"])
        for r in C.label_horizon(
            df, "user_id", "ts", F.col("event_type") == "purchase", 3600.0
        ).collect()
    }
    # the purchase AT t0 is a frame peer -> excluded (it is information
    # at time t, not after it); only the +1h purchase labels t0
    assert out[0] == (1, True)
    assert out[1] == (1, True)   # its own peer row excluded, the +1h one in
    assert out[2] == (0, False)  # nothing after the last purchase
    assert out[3] == (0, False)  # 1us past horizon
    assert out[5] == (0, False)


def test_label_horizon_matches_pandas(spark, events_pdf=None):
    rng = np.random.default_rng(7)
    n = 800
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 25, n).astype(str),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "event_type": rng.choice(["view", "purchase", "click"], n),
    })
    df = spark.createDataFrame(pdf)
    got = (
        C.label_horizon(df, "user_id", "ts", F.col("event_type") == "purchase", 600.0)
        .select("event_id", "label_n")
        .toPandas()
        .set_index("event_id")["label_n"]
    )
    for _, r in pdf.iterrows():
        m = pdf[
            (pdf.user_id == r.user_id)
            & (pdf.ts > r.ts)
            & (pdf.ts <= r.ts + pd.Timedelta(seconds=600))
            & (pdf.event_type == "purchase")
        ]
        assert got[r.event_id] == len(m)


# -------------------------------------------------- sample_topn_per_group

def test_topn_exact_count_and_partitioning_invariance(spark):
    df = spark.range(5000).select(
        F.col("id").alias("row_id"), (F.col("id") % 7).alias("grp")
    )
    out1 = C.sample_topn_per_group(df, "grp", "row_id", n=10)
    got1 = sorted(r["row_id"] for r in out1.collect())
    # exactly 10 per group
    counts = {r["grp"]: r["n"] for r in out1.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    # identical set under a hostile repartitioning
    out2 = C.sample_topn_per_group(df.repartition(13, "row_id"), "grp", "row_id", n=10)
    assert sorted(r["row_id"] for r in out2.collect()) == got1
    # matches the python re-derivation of the salted-hash ranking
    ids = list(range(5000))
    by_grp: dict[int, list[int]] = {}
    for i in ids:
        by_grp.setdefault(i % 7, []).append(i)
    exp = []
    for g, members in by_grp.items():
        members.sort(key=lambda i: (hashlib.md5(f"topn-v1{i}".encode()).hexdigest(), i))
        exp += members[:10]
    assert got1 == sorted(exp)


def test_topn_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    out = C.sample_topn_per_group(df, "g", "id", n=5)
    assert out.count() == 3


def test_topn_plan_has_window_group_limit(spark):
    df = spark.range(1000).select(
        F.col("id").alias("row_id"), (F.col("id") % 3).alias("grp")
    )
    plan = C.sample_topn_per_group(df, "grp", "row_id", n=5)._jdf.queryExecution(
    ).executedPlan().toString()
    # rank-limit pushdown: each map task forwards <= n rows per group
    # BEFORE the exchange — the property that keeps the shuffle
    # O(groups x n) instead of corpus-sized
    assert "WindowGroupLimit" in plan


# --------------------------------------------------------- domain_mixture

def test_domain_mixture_weights_normalize_and_match_numpy(spark):
    pdf = pd.DataFrame({
        "dom": ["a"] * 5 + ["b"] * 3 + ["c"] * 2,
        "toks": [100] * 5 + [50] * 3 + [10] * 2,
    })
    out = C.domain_mixture(
        spark.createDataFrame(pdf), ["dom"], F.col("toks"), alpha=0.5,
        target_size=1000.0,
    ).toPandas().set_index("dom").sort_index()
    sizes = pdf.groupby("dom")["toks"].sum().sort_index().astype(float)
    raw = sizes ** 0.5
    exp_w = raw / raw.sum()
    assert np.allclose(out["weight"], exp_w)
    assert abs(out["weight"].sum() - 1.0) < 1e-12
    assert np.allclose(out["epochs"], 1000.0 * exp_w / sizes)
    # alpha=0 -> uniform over domains regardless of size
    uni = C.domain_mixture(
        spark.createDataFrame(pdf), ["dom"], F.col("toks"), alpha=0.0
    ).toPandas()
    assert np.allclose(uni["weight"], 1 / 3)


# ----------------------------------------------------- importance_weights

def _bucket(gram: str, n_buckets: int = 4096) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % n_buckets


def test_importance_weights_match_python(spark):
    docs = [
        (0, "the cat sat on the mat", 1),
        (1, "the dog ran fast", 1),
        (2, "le chat est noir", 0),
        (3, "le chien court vite", 0),
        (4, "the cat ran vite", 1),
        (5, "single", 0),  # <2 words -> no bigrams -> absent from output
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, is_en int")
    out = {
        r["doc_id"]: r["importance"]
        for r in C.importance_weights(
            df, "doc_id", "text", F.col("is_en") == 1, n_buckets=64, alpha=1.0
        ).collect()
    }
    assert 5 not in out and len(out) == 5
    # python re-derivation
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, is_en in docs:
        ws = text.split()
        bs = [_bucket(f"{a} {b}", 64) for a, b in zip(ws, ws[1:])]
        doc_buckets[doc_id] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if is_en:
                tgt[b] = tgt.get(b, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    for doc_id, bs in doc_buckets.items():
        if not bs:
            continue
        exp = sum(
            math.log((tgt.get(b, 0) + 1) / (nt + 64))
            - math.log((raw[b] + 1) / (nr + 64))
            for b in bs
        ) / len(bs)
        assert abs(out[doc_id] - exp) < 1e-9
    # english docs should rank above french ones under an english target
    assert min(out[0], out[1]) > max(out[2], out[3])


# ------------------------------------------------------------ psi_by_split

def test_psi_zero_for_identical_distributions(spark):
    pdf = pd.DataFrame({
        "split": ["train"] * 500 + ["test"] * 500,
        "v": list(range(500)) * 2,
    })
    out = C.psi_by_split(spark.createDataFrame(pdf), "split", "v").collect()
    assert len(out) == 1 and abs(out[0]["psi"]) < 1e-12


def test_psi_counts_one_sided_bins_and_matches_numpy(spark):
    # train occupies bins 0-4, test occupies bins 5-9: every bin is
    # one-sided; a join that only visited shared bins would return ~0
    pdf = pd.DataFrame({
        "split": ["train"] * 100 + ["test"] * 100,
        "v": list(np.linspace(0.0, 4.9, 100)) + list(np.linspace(5.1, 10.0, 100)),
    })
    got = {
        r["split"]: r["psi"]
        for r in C.psi_by_split(
            spark.createDataFrame(pdf), "split", "v", n_bins=10, eps=1e-4
        ).collect()
    }
    lo, hi = pdf.v.min(), pdf.v.max()
    width = (hi - lo) / 10
    psi = 0.0
    for b in range(10):
        def frac(side):
            vs = pdf[pdf.split == side].v
            bins = np.minimum(np.floor((vs - lo) / width).astype(int), 9)
            return (bins == b).mean()
        p, q = frac("train") + 1e-4, frac("test") + 1e-4
        psi += (p - q) * math.log(p / q)
    assert abs(got["test"] - psi) < 1e-9
    assert got["test"] > 1.0  # total separation is a huge shift


def test_psi_degenerate_constant_value(spark):
    df = spark.createDataFrame(
        [("train", 1.0)] * 10 + [("test", 1.0)] * 10, "split string, v double"
    )
    out = C.psi_by_split(df, "split", "v").collect()
    assert len(out) == 1 and abs(out[0]["psi"]) < 1e-12


# ------------------------------------------------- weighted sampling (ES)


def test_sample_weighted_exact_n_and_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], "id long, w double"
    )
    a = C.sample_weighted(df, "id", F.col("w"), n=50)
    b = C.sample_weighted(df.repartition(13), "id", F.col("w"), n=50)
    ids_a = sorted(r["id"] for r in a.collect())
    ids_b = sorted(r["id"] for r in b.collect())
    assert len(ids_a) == 50 and ids_a == ids_b  # partitioning-invariant


def test_sample_weighted_excludes_nonpositive_weights(spark):
    rows = [(i, 1.0 if i < 10 else (0.0 if i < 20 else -1.0)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in
                 C.sample_weighted(df, "id", F.col("w"), n=15).collect())
    # only the 10 positive-weight rows can ever sample
    assert got == list(range(10))


def test_sample_weighted_skews_toward_heavy_rows(spark):
    # 1000 rows, 100 with weight 50, 900 with weight 1: heavy rows hold
    # ~84.8% of total mass; a size-200 ES sample must be heavy-dominated
    rows = [(i, 50.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in C.sample_weighted(df, "id", F.col("w"), n=200).collect()]
    heavy = sum(1 for i in got if i < 100)
    # all 100 heavy rows are near-certain to make a 200-sample; allow slack
    assert heavy >= 90


def test_sample_weighted_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(100)], "id long, w double")
    plan = C.sample_weighted(df, "id", F.col("w"), n=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle: per-task heaps, driver merge


# ------------------------------------------------------ curriculum_buckets

def _docs_df(spark, lengths):
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(lengths), dtype="int64"),
        "n_chars": np.asarray(lengths, dtype="int64"),
    })
    return spark.createDataFrame(pdf)


def test_curriculum_buckets_monotone_and_balanced(spark):
    lengths = list(range(1, 101))  # 100 docs, distinct scores
    out = C.curriculum_buckets(_docs_df(spark, lengths), n_buckets=4).toPandas()
    out = out.sort_values("score").reset_index(drop=True)
    # monotone: bucket never decreases as the score grows
    assert (out["bucket"].diff().fillna(0) >= 0).all()
    # balanced: exact quartiles of 100 distinct values -> 25 each
    assert out.groupby("bucket").size().tolist() == [25, 25, 25, 25]
    assert set(out["bucket"]) == {0, 1, 2, 3}


def test_curriculum_boundary_score_goes_down(spark):
    # 1..4: quantile_cont(.5) of [1,2,3,4] = 2.5; a doc AT an exact
    # boundary value joins the lower bucket (strict < comparison)
    lengths = [1, 2, 2, 4]  # p25=1.75, p50=2.0, p75=2.5
    out = C.curriculum_buckets(_docs_df(spark, lengths), n_buckets=4).toPandas()
    by_id = out.set_index("doc_id")
    # score 2.0 == p50 boundary: only p25 (1.75) is strictly below -> bucket 1
    assert by_id.loc[1, "bucket"] == 1
    assert by_id.loc[2, "bucket"] == 1
    assert by_id.loc[0, "bucket"] == 0
    assert by_id.loc[3, "bucket"] == 3


def test_curriculum_partitioning_invariance(spark):
    lengths = [7, 3, 9, 1, 5, 5, 2, 8, 6, 4] * 7
    df = _docs_df(spark, lengths)
    a = C.curriculum_buckets(df, n_buckets=5).toPandas()
    b = C.curriculum_buckets(df.repartition(13), n_buckets=5).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_curriculum_order_key_is_md5_of_id(spark):
    out = C.curriculum_buckets(_docs_df(spark, [10, 20]), n_buckets=2).toPandas()
    for _, r in out.iterrows():
        assert r["order_key"] == hashlib.md5(str(int(r["doc_id"])).encode()).hexdigest()


def test_curriculum_rejects_single_bucket(spark):
    with pytest.raises(ValueError):
        C.curriculum_buckets(_docs_df(spark, [1, 2]), n_buckets=1)


def test_curriculum_null_and_nan_score_surface_as_null_bucket(spark):
    # a NULL/NaN difficulty score must NOT be silently binned into
    # bucket 0 (the r4 ADVICE finding): it gets a NULL bucket instead
    pdf = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "s": [1.0, 2.0, 3.0, 4.0, None, float("nan")],
    })
    out = C.curriculum_buckets(
        spark.createDataFrame(pdf), score=F.col("s"), n_buckets=2
    ).toPandas().set_index("doc_id")
    assert pd.isna(out.loc[4, "bucket"]) and pd.isna(out.loc[5, "bucket"])
    # non-null docs bucket normally (percentile ignores nulls)
    assert out.loc[0, "bucket"] == 0 and out.loc[3, "bucket"] == 1


def test_curriculum_nan_heavy_scores_keep_top_bucket_reachable(spark):
    # r5: NaN must be masked BEFORE the percentile aggregate too — Spark
    # ranks NaN above every double, so with >25% NaN scores the 0.75
    # boundary would itself be NaN and "b < score" could never admit any
    # row to the top bucket (every non-NaN doc silently compresses into
    # buckets 0..n-2)
    pdf = pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "s": [1.0, 2.0, 3.0, 4.0] + [float("nan")] * 4,  # 50% NaN
    })
    out = C.curriculum_buckets(
        spark.createDataFrame(pdf), score=F.col("s"), n_buckets=4
    ).toPandas().set_index("doc_id")
    # boundaries = quartiles of the four REAL scores; doc 3 (s=4.0) must
    # land in the top bucket, and each real doc in its own quartile
    assert [out.loc[i, "bucket"] for i in range(4)] == [0, 1, 2, 3]
    assert out.loc[4:, "bucket"].isna().all()


# ----------------------------------------------------- negative_samples

def _ids_df(spark, n):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n, dtype="int64")})
    )


def test_negative_samples_counts_no_self_distinct(spark):
    out = C.negative_samples(_ids_df(spark, 5), k=3, n_buckets=1).toPandas()
    # single bucket of 5: every anchor gets exactly 3 DISTINCT negatives
    g = out.groupby("doc_id")["neg_id"]
    assert (g.count() == 3).all() and (g.nunique() == 3).all()
    assert (out["doc_id"] != out["neg_id"]).all()
    assert set(out["doc_id"]) == set(range(5))


def test_negative_samples_small_and_singleton_buckets(spark):
    # 2 docs, one bucket: exactly one negative each (cap at cnt-1)
    out2 = C.negative_samples(_ids_df(spark, 2), k=3, n_buckets=1).toPandas()
    assert len(out2) == 2 and (out2.groupby("doc_id").size() == 1).all()
    # singleton corpus: no negatives at all
    assert C.negative_samples(_ids_df(spark, 1), k=3, n_buckets=1).count() == 0


def test_negative_samples_partitioning_invariant(spark):
    df = _ids_df(spark, 64)
    a = C.negative_samples(df, k=2, n_buckets=4).toPandas()
    b = C.negative_samples(df.repartition(11), k=2, n_buckets=4).toPandas()
    key = ["doc_id", "neg_rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_negative_samples_salt_rotates_pairings(spark):
    df = _ids_df(spark, 40)
    a = C.negative_samples(df, k=1, n_buckets=1, salt="epoch0").toPandas()
    b = C.negative_samples(df, k=1, n_buckets=1, salt="epoch1").toPandas()
    pa = dict(zip(a["doc_id"], a["neg_id"]))
    pb = dict(zip(b["doc_id"], b["neg_id"]))
    assert pa != pb  # a different salt draws a different ring order


# --------------------------------------------------- materialize_mixture

def test_materialize_mixture_counts_and_determinism(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "dom": ["a"] * 80 + ["b"] * 20,
    }))
    mix = spark.createDataFrame(pd.DataFrame({
        "dom": ["a", "b"], "epochs": [0.5, 2.25],
    }))
    out = C.materialize_mixture(docs, mix, ["dom"]).toPandas()
    # dom a: 0 whole copies + Bernoulli(0.5) extras -> ~40 of 80
    na = len(out[out["dom"] == "a"])
    assert 20 <= na <= 60
    # dom b: 2 whole copies each + Bernoulli(0.25) -> between 40 and 60
    nb = len(out[out["dom"] == "b"])
    assert 40 <= nb <= 60
    per_b = out[out["dom"] == "b"].groupby("doc_id").size()
    assert per_b.isin([2, 3]).all()
    # epoch_idx is 0..n-1 per doc
    for _, g in out.groupby("doc_id"):
        assert sorted(g["epoch_idx"]) == list(range(len(g)))
    # deterministic under repartitioning
    again = C.materialize_mixture(
        docs.repartition(7), mix, ["dom"]
    ).toPandas()
    key = ["doc_id", "epoch_idx"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )


def test_materialize_mixture_absent_domain_drops_and_zero_epochs(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(10, dtype="int64"),
        "dom": ["a"] * 5 + ["z"] * 5,
    }))
    mix = spark.createDataFrame(pd.DataFrame({
        "dom": ["a", "x"], "epochs": [1.0, 3.0],
    }))
    out = C.materialize_mixture(docs, mix, ["dom"]).toPandas()
    assert set(out["dom"]) == {"a"}          # 'z' absent from mixture -> dropped
    assert (out.groupby("doc_id").size() == 1).all()  # epochs=1.0 exact
    # integer epochs never draw the stochastic extra
    assert out["epoch_idx"].max() == 0
    # epochs 0.0 -> empty output for that domain
    mix0 = spark.createDataFrame(pd.DataFrame({"dom": ["a"], "epochs": [0.0]}))
    assert C.materialize_mixture(docs, mix0, ["dom"]).count() == 0


def test_negative_samples_rejects_k_below_one(spark):
    with pytest.raises(ValueError):
        C.negative_samples(_ids_df(spark, 5), k=0, n_buckets=1)
