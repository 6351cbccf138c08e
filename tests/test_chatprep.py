"""Training-example assembly over transcripts (operators/chatprep.py).

The load-bearing invariant: loss_mask_spans computes character offsets
WITHOUT rendering, so spans sliced out of render_conversations' document
must reproduce every turn byte-for-byte — the per-row "text byte-equal
under stable ordering" contract extended to the rendered example.
"""

import datetime as dt

import pandas as pd

import pytest
from pyspark.sql import functions as F

from amazon_security_lake_transformation_library_spark.operators import chatprep as chp


@pytest.fixture(scope="module")
def rendered(spark, transcripts_df):
    return {
        r["conv_id"]: r["rendered"]
        for r in chp.render_conversations(transcripts_df).collect()
    }


def test_render_matches_manual_concat(spark, transcripts_df, rendered):
    # independent per-row reconstruction in Python (driver-side, test only)
    rows = transcripts_df.collect()
    by_conv: dict = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        head = f"<|{r['role']}:{r['tool']}|>\n" if r["tool"] is not None else f"<|{r['role']}|>\n"
        by_conv.setdefault(r["conv_id"], []).append(head + r["text"] + "\n")
    assert set(by_conv) == set(rendered)
    for cid, segs in by_conv.items():
        assert rendered[cid] == "".join(segs)


def test_spans_slice_rendered_document(spark, transcripts_df, rendered):
    spans = chp.loss_mask_spans(transcripts_df).collect()
    turn_text = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in transcripts_df.select("conv_id", "turn_idx", "text").collect()
    }
    assert len(spans) == len(turn_text)
    for s in spans:
        doc = rendered[s["conv_id"]]
        expect = turn_text[(s["conv_id"], s["turn_idx"])] + "\n"
        assert doc[s["text_start"]:s["text_end"]] == expect
        # the full segment starts with the header
        assert doc[s["seg_start"]:s["seg_start"] + 2] == "<|"


def test_loss_mask_marks_assistant_only(spark, transcripts_df):
    spans = chp.loss_mask_spans(transcripts_df, loss_role="assistant")
    bad = spans.filter(
        (F.col("loss") & (F.col("role") != "assistant"))
        | (~F.col("loss") & (F.col("role") == "assistant"))
    )
    assert bad.count() == 0


def test_render_max_turns_cap(spark, transcripts_df):
    capped = chp.render_conversations(transcripts_df, max_turns=3)
    assert capped.agg(F.max("n_turns")).first()[0] <= 3
    # cap keeps the LEADING turns: capped doc is a prefix of the full doc
    full = {r["conv_id"]: r["rendered"]
            for r in chp.render_conversations(transcripts_df).collect()}
    for r in capped.collect():
        assert full[r["conv_id"]].startswith(r["rendered"])


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )


def test_prefix_dedup_groups_shared_prefixes(spark):
    t0 = dt.datetime(2024, 1, 1)
    shared = [("user", "hi"), ("assistant", "hello"), ("user", "do X"),
              ("assistant", "ok")]
    rows = []
    for cid in ("conv_a", "conv_b"):
        for i, (role, txt) in enumerate(shared + [("user", f"tail {cid}")]):
            rows.append((cid, i, role, txt, None, t0))
    # conv_c diverges inside the prefix window
    for i, (role, txt) in enumerate(shared):
        rows.append(("conv_c", i, role, txt + ("!" if i == 3 else ""), None, t0))
    out = {r["conv_id"]: r for r in
           chp.conv_prefix_fingerprint(_mk(spark, rows), k=4).collect()}
    assert out["conv_a"]["prefix_fp"] == out["conv_b"]["prefix_fp"]
    assert out["conv_c"]["prefix_fp"] != out["conv_a"]["prefix_fp"]
    assert out["conv_a"]["canonical_conv"] == "conv_a"
    assert not out["conv_a"]["is_dup"] and out["conv_b"]["is_dup"]
    assert not out["conv_c"]["is_dup"]
    assert out["conv_a"]["n_prefix_turns"] == 4


def test_validate_turns_flags_each_defect(spark):
    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = []
    # good: alternation with a transparent tool turn in the middle
    for i, role in enumerate(["user", "assistant", "tool", "user", "assistant"]):
        rows.append(("good", i, role, "t", None, t0 + i * sec))
    # gap in turn_idx
    for i, role in zip([0, 1, 3], ["user", "assistant", "user"]):
        rows.append(("gap", i, role, "t", None, t0 + i * sec))
    # double user turn
    for i, role in enumerate(["user", "user", "assistant"]):
        rows.append(("dbl", i, role, "t", None, t0 + i * sec))
    # timestamp regression
    for i, ts in enumerate([t0, t0 + 2 * sec, t0 + sec]):
        rows.append(("tsr", i, ["user", "assistant", "user"][i], "t", None, ts))
    out = {r["conv_id"]: r for r in chp.validate_turns(_mk(spark, rows)).collect()}
    assert out["good"]["ok"]
    assert not out["gap"]["idx_contiguous"] and out["gap"]["roles_alternate"]
    assert not out["dbl"]["roles_alternate"] and out["dbl"]["idx_contiguous"]
    assert not out["tsr"]["ts_monotone"] and not out["tsr"]["ok"]


def test_context_budget_keeps_fitting_suffix(spark):
    t0 = dt.datetime(2024, 1, 1)
    # est_tokens = ceil(len/4) + 4; craft lengths 40 -> 14 tokens each
    rows = [("c", i, "user", "x" * 40, None, t0) for i in range(5)]
    out = chp.context_budget(_mk(spark, rows), budget_tokens=30).collect()
    by_idx = {r["turn_idx"]: r for r in out}
    assert all(r["est_tokens"] == 14 for r in out)
    # from the end: idx4 cum=14 keep, idx3 cum=28 keep, idx2 cum=42 drop
    assert by_idx[4]["keep"] and by_idx[3]["keep"]
    assert not by_idx[2]["keep"] and not by_idx[0]["keep"]
    # kept set is always a suffix: keep is monotone in turn_idx
    kept = [r["turn_idx"] for r in out if r["keep"]]
    assert kept and min(kept) + len(kept) - 1 == max(kept) == 4


def test_boilerplate_turns_threshold_on_distinct_convs(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # "canned" appears once in each of 3 convs; "repeat" 3x within ONE conv
    for j, cid in enumerate(["c1", "c2", "c3"]):
        rows.append((cid, 0, "user", "q", None, t0))
        rows.append((cid, 1, "assistant", "canned", None, t0))
    for i in range(3):
        rows.append(("c4", i, "assistant", "repeat", None, t0))
    out = {r["text"]: r for r in
           chp.boilerplate_turns(_mk(spark, rows), min_convs=3).collect()}
    assert set(out) == {"canned"}
    assert out["canned"]["n_convs"] == 3 and out["canned"]["n_occurrences"] == 3
    # lowering the threshold surfaces the within-conv repeat with n_convs=1
    out2 = {r["text"]: r for r in
            chp.boilerplate_turns(_mk(spark, rows), min_convs=1).collect()}
    assert out2["repeat"]["n_convs"] == 1 and out2["repeat"]["n_occurrences"] == 3


def test_conv_profile_handcrafted(spark):
    t0 = dt.datetime(2024, 1, 1)
    mins = dt.timedelta(minutes=1)
    rows = [
        ("c", 0, "user", "aaaa", None, t0),
        ("c", 1, "assistant", "bbbbbb", None, t0 + mins),
        ("c", 2, "tool", "cc", "tool_01", t0 + 2 * mins),
        # 31-minute gap -> session break (gap_seconds=1800)
        ("c", 3, "user", "dd", None, t0 + 33 * mins),
        ("c", 4, "assistant", "ee", None, t0 + 34 * mins),
    ]
    p = chp.conv_profile(_mk(spark, rows), gap_seconds=1800.0).collect()[0]
    assert p["n_turns"] == 5 and p["n_sessions"] == 2
    assert p["n_tool_calls"] == 1 and p["n_assistant_turns"] == 2
    assert abs(p["assistant_char_frac"] - 8 / 16) < 1e-12
    assert p["duration_s"] == 34 * 60.0
    # mean over the 4 gaps: (60 + 60 + 1860 + 60) / 4
    assert abs(p["mean_gap_s"] - 510.0) < 1e-9


def test_conv_profile_sessions_agree_with_flagship_sessionizer(spark, transcripts_df):
    from amazon_security_lake_transformation_library_spark.operators import features as feat
    prof = chp.conv_profile(transcripts_df, gap_seconds=1800.0)
    sess = (feat.sessionize(transcripts_df, gap_seconds=1800.0)
            .groupBy("conv_id")
            .agg(F.countDistinct("session_id").alias("n")))
    joined = prof.join(sess, "conv_id")
    assert joined.filter(F.col("n_sessions") != F.col("n")).count() == 0


# ----------------------------------------------------------------- SFT pairs


def test_sft_pairs_prompt_is_rendered_prefix(spark, transcripts_df, rendered):
    """Unbounded sft_pairs: each prompt must be a byte-exact PREFIX of the
    conversation's rendered document, cut at the response turn's segment
    start (the loss_mask_spans offset) — prompt construction and span
    arithmetic agree by construction."""
    spans = {
        (r["conv_id"], r["turn_idx"]): r["seg_start"]
        for r in chp.loss_mask_spans(transcripts_df).collect()
    }
    turns = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in transcripts_df.collect()
    }
    pairs = chp.sft_pairs(transcripts_df).collect()
    expect_n = sum(
        1 for (cid, ti), (role, _) in turns.items()
        if role == "assistant" and ti > 0
    )
    assert len(pairs) == expect_n and expect_n > 0
    for r in pairs:
        key = (r["conv_id"], r["turn_idx"])
        assert turns[key][0] == "assistant"
        assert r["response"] == turns[key][1]
        assert r["prompt"] == rendered[r["conv_id"]][: spans[key]]
        assert r["n_prompt_turns"] == r["turn_idx"]


def test_sft_pairs_max_prompt_turns_cap(spark, transcripts_df, rendered):
    capped = chp.sft_pairs(transcripts_df, max_prompt_turns=2).collect()
    full = {
        (r["conv_id"], r["turn_idx"]): r["prompt"]
        for r in chp.sft_pairs(transcripts_df).collect()
    }
    assert {(r["conv_id"], r["turn_idx"]) for r in capped} == set(full)
    for r in capped:
        assert r["n_prompt_turns"] == min(2, r["turn_idx"])
        # the capped prompt is a SUFFIX of the unbounded prompt
        assert full[(r["conv_id"], r["turn_idx"])].endswith(r["prompt"])
        assert len(r["prompt"]) > 0


# ---------------------------------------------------------------- tool chains


def test_tool_chains_counts(spark):
    ts = dt.datetime(2024, 1, 1)
    rows = []
    # conv a and b run the same pipeline search>fetch; conv c runs fetch;
    # conv d never calls a tool
    for cid, tools in [
        ("a", ["search", None, "fetch"]),
        ("b", ["search", "fetch", None]),
        ("c", [None, "fetch"]),
        ("d", [None, None]),
    ]:
        for i, tool in enumerate(tools):
            rows.append((cid, i, "assistant", f"t{i}", tool, ts))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["chain"]: (r["n_calls"], r["n_convs"]) for r in chp.tool_chains(t).collect()}
    assert got == {"search>fetch": (2, 2), "fetch": (1, 1)}
    got2 = {r["chain"] for r in chp.tool_chains(t, min_convs=2).collect()}
    assert got2 == {"search>fetch"}


# ------------------------------------------------- conversation-level near-dup


def test_conv_near_dup_finds_cloned_conversation(spark, transcripts_df):
    """A replayed conversation with one turn dropped must surface as an
    LSH candidate pair with its original; unrelated synthetic convs (which
    share no shingles — texts embed the conv id) must not pair."""
    some = transcripts_df.orderBy("conv_id").select("conv_id").first()["conv_id"]
    clone = (
        transcripts_df.filter((F.col("conv_id") == some) & (F.col("turn_idx") != 2))
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_v2")))
    )
    pairs = chp.conv_near_dup_pairs(transcripts_df.unionByName(clone)).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(some, some + "_v2")}
    assert all(r["n_shared_bands"] >= 1 for r in pairs)


def test_sft_and_chains_empty_and_degenerate(spark):
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    assert chp.sft_pairs(empty).count() == 0
    assert chp.tool_chains(empty).count() == 0
    assert chp.conv_near_dup_pairs(empty).count() == 0
    # a conversation whose only turn is the assistant's: no prompt => no pair
    one = spark.createDataFrame(
        [("c", 0, "assistant", "hi", None, dt.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    assert chp.sft_pairs(one).count() == 0


# ------------------------------------------------------ preference pairs


def _pp_rows(convs):
    """convs: {conv_id: [(role, text), ...]} -> transcript rows with a
    shared timestamp spine."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for cid, turns in convs.items():
        for i, (role, text) in enumerate(turns):
            rows.append(
                (cid, i, role, text, None, base + dt.timedelta(minutes=i))
            )
    return rows


def _pp_df(spark, convs):
    return spark.createDataFrame(
        _pp_rows(convs), "conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp"
    )


def test_preference_pairs_chosen_rejected(spark):
    shared = [("user", "hi"), ("assistant", "hello")]
    t = _pp_df(spark, {
        "a": shared + [("user", "q"), ("assistant", "short")],
        "b": shared + [("user", "q"), ("assistant", "a longer response")],
        "c": shared + [("user", "q"), ("assistant", "mid answer")],
        # different prefix -> its own (singleton) group, emits nothing
        "d": [("user", "other"), ("assistant", "x"),
              ("user", "q"), ("assistant", "y")],
    })
    out = chp.preference_pairs(t, k_prefix=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_candidates"] == 3
    assert r["chosen_conv"] == "b"
    assert r["chosen_response"] == "a longer response"
    assert r["rejected_conv"] == "a"
    assert r["rejected_response"] == "short"
    assert r["chosen_score"] > r["rejected_score"]


def test_preference_pairs_response_is_first_assistant_after_prefix(spark):
    shared = [("user", "hi"), ("assistant", "hello")]
    t = _pp_df(spark, {
        # first post-prefix assistant turn is idx 3, not the later idx 5
        "a": shared + [("user", "q"), ("assistant", "first answer"),
                       ("user", "more"), ("assistant", "second answer!!")],
        "b": shared + [("user", "q"), ("assistant", "tiny")],
    })
    out = chp.preference_pairs(t, k_prefix=2).collect()
    assert len(out) == 1
    assert out[0]["chosen_response"] == "first answer"


def test_preference_pairs_all_tied_group_emits_nothing(spark):
    shared = [("user", "hi"), ("assistant", "hello")]
    t = _pp_df(spark, {
        "a": shared + [("user", "q"), ("assistant", "same len")],
        "b": shared + [("user", "q"), ("assistant", "also 8ch")],
    })
    assert chp.preference_pairs(t, k_prefix=2).count() == 0


def test_preference_pairs_custom_score_column(spark):
    shared = [("user", "hi"), ("assistant", "hello")]
    t = _pp_df(spark, {
        "a": shared + [("user", "q"), ("assistant", "zzzz long but bad")],
        "b": shared + [("user", "q"), ("assistant", "good")],
    })
    # score by count of 'o' characters: b wins despite being shorter
    score = F.length("response") - F.length(F.replace(F.col("response"), F.lit("o"), F.lit("")))
    out = chp.preference_pairs(t, k_prefix=2, score=score).collect()
    assert len(out) == 1
    assert out[0]["chosen_conv"] == "b"


def test_preference_pairs_no_response_conv_drops(spark):
    shared = [("user", "hi"), ("assistant", "hello")]
    t = _pp_df(spark, {
        "a": shared + [("user", "q"), ("assistant", "answer one")],
        "b": shared,  # ends at the prefix: no post-prefix assistant turn
        "c": shared + [("user", "q"), ("assistant", "hm")],
    })
    out = chp.preference_pairs(t, k_prefix=2).collect()
    assert len(out) == 1
    assert out[0]["n_candidates"] == 2
    assert {out[0]["chosen_conv"], out[0]["rejected_conv"]} == {"a", "c"}


# ----------------------------------------------------------- repair_turns


def _broken_df(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # conv a: duplicate turn_idx 1 (later ts must win), gap at 3
        ("a", 0, "user", "hi", None, base),
        ("a", 1, "assistant", "old answer", None, base + dt.timedelta(minutes=1)),
        ("a", 1, "assistant", "new answer", None, base + dt.timedelta(minutes=2)),
        ("a", 4, "user", "next", None, base + dt.timedelta(minutes=3)),
        # conv b: already clean
        ("b", 0, "user", "q", None, base),
        ("b", 1, "assistant", "a", None, base + dt.timedelta(minutes=1)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_repair_turns_dedups_and_reindexes(spark):
    out = chp.repair_turns(_broken_df(spark)).toPandas()
    a = out[out["conv_id"] == "a"].sort_values("turn_idx")
    assert a["turn_idx"].tolist() == [0, 1, 2]
    assert a["text"].tolist() == ["hi", "new answer", "next"]
    assert a["orig_turn_idx"].tolist() == [0, 1, 4]
    assert a["was_dup"].tolist() == [False, True, False]
    b = out[out["conv_id"] == "b"].sort_values("turn_idx")
    assert b["turn_idx"].tolist() == [0, 1]
    assert not b["was_dup"].any()


def test_repair_turns_makes_validate_pass_and_is_idempotent(spark):
    repaired = chp.repair_turns(_broken_df(spark))
    v = chp.validate_turns(repaired).toPandas()
    assert v["idx_contiguous"].all()
    again = chp.repair_turns(
        repaired.drop("orig_turn_idx", "was_dup")
    ).toPandas()
    first = repaired.toPandas()
    cols = ["conv_id", "turn_idx", "text"]
    pd_first = first[cols].sort_values(cols).reset_index(drop=True)
    pd_again = again[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(pd_first, pd_again)
    assert not again["was_dup"].any()


def test_repair_turns_exact_ts_tie_breaks_on_text_hash(spark):
    import hashlib
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "user", "alpha", None, base),
        ("c", 0, "user", "beta", None, base),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    out = chp.repair_turns(t).toPandas()
    assert len(out) == 1
    want = max(
        ["alpha", "beta"],
        key=lambda s: hashlib.md5(
            f"user\x1f\x1f{s}".encode()  # role US tool US text
        ).hexdigest(),
    )
    assert out["text"].tolist() == [want]


def test_repair_turns_role_only_tie_is_deterministic(spark):
    # equal ts AND equal text, differing only in role: the payload hash
    # must still pick one winner deterministically (review finding r4)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("d", 0, "user", "same", None, base),
        ("d", 0, "assistant", "same", None, base),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    a = chp.repair_turns(t).toPandas()
    b = chp.repair_turns(t.repartition(5)).toPandas()
    assert len(a) == len(b) == 1
    assert a["role"].tolist() == b["role"].tolist()
    import hashlib
    want = max(
        ["user", "assistant"],
        key=lambda r: hashlib.md5(f"{r}\x1f\x1fsame".encode()).hexdigest(),
    )
    assert a["role"].tolist() == [want]
