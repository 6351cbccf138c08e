"""Tests for the repetition / corpus-quality operators (repetition.py)
and the PII scrubber (textstats.scrub_pii).

Oracles are pure-python recomputations on tiny deterministic corpora —
independent of both Spark and DuckDB (the DuckDB differential oracle for
the same operators lives in __spark_entry__.py and is exercised by
tools/check_oracle.py / the driver)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from amazon_security_lake_transformation_library_spark.operators import (
    repetition as rep,
)
from amazon_security_lake_transformation_library_spark.operators import (
    textstats as ts_ops,
)

DOCS = [
    (0, "a b a b a b a b"),                    # heavy bigram repetition
    (1, "x x x x x x"),                        # one word repeated
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "w"),                                  # shorter than every n
    (4, ""),                                   # empty text
    (5, "p q r p q r p q r s t u"),            # repeated trigram run
]


def _grams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _top_chars(words: list[str], n: int) -> int:
    c = Counter(_grams(words, n))
    return max((cnt * len(g) for g, cnt in c.items()), default=0)


def _dup_chars(words: list[str], n: int) -> int:
    c = Counter(_grams(words, n))
    return sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)


def _r4(x: float) -> float:
    return round(x, 4) + 0.0


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    ).cache()


def test_repetition_stats_oracle(docs_df):
    out = (
        rep.repetition_stats(docs_df)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == len(DOCS)
    for doc_id, text in DOCS:
        row = out.loc[doc_id]
        words = text.split(" ")  # matches F.split: "" -> [""]
        nc = max(len(text), 1)
        assert row["n_words"] == len(words)
        assert row["dup_word_frac"] == pytest.approx(
            _r4((len(words) - len(set(words))) / max(len(words), 1))
        )
        for n in (2, 3, 4):
            assert row[f"top{n}_char_frac"] == pytest.approx(
                _r4(_top_chars(words, n) / nc)
            ), (doc_id, n)
        for n in (5, 8, 10):
            assert row[f"dup{n}_char_frac"] == pytest.approx(
                _r4(min(_dup_chars(words, n) / nc, 1.0))
            ), (doc_id, n)


def test_repetition_overlap_clamps_to_one(spark):
    # "x x x ... x" : every 5-gram is identical and they overlap, so the
    # duplicated-char mass exceeds the text length -> clamped to 1.0.
    df = spark.createDataFrame(
        pd.DataFrame([(0, " ".join(["x"] * 40))], columns=["doc_id", "text"])
    )
    row = rep.repetition_stats(df).toPandas().iloc[0]
    assert row["dup5_char_frac"] == 1.0
    assert row["dup_word_frac"] == pytest.approx(_r4(39 / 40))


def test_line_stats_oracle(spark):
    docs = [
        (0, "a b\na b\nc d"),          # one duplicated line of 3
        (1, "only one line"),
        (2, "x\n\n  \nx\ny"),          # blank + whitespace lines dropped
        (3, ""),                       # no non-blank lines at all
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    out = rep.line_stats(df).toPandas().set_index("doc_id").sort_index()
    for doc_id, text in docs:
        lines = [l for l in text.split("\n") if l.strip()]
        c = Counter(lines)
        dupc = sum(cnt * len(l) for l, cnt in c.items() if cnt >= 2)
        totc = sum(len(l) for l in lines)
        row = out.loc[doc_id]
        assert row["n_lines"] == len(lines)
        assert row["dup_line_frac"] == pytest.approx(
            _r4((len(lines) - len(set(lines))) / max(len(lines), 1))
        )
        assert row["dup_line_char_frac"] == pytest.approx(
            _r4(dupc / max(totc, 1))
        )


def test_top_ngrams_exact(docs_df):
    out = rep.top_ngrams(docs_df, n=2, k=3).toPandas()
    c = Counter()
    for _, text in DOCS:
        c.update(_grams(text.split(" "), 2))
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = list(zip(out["gram"], out["cnt"]))
    assert got == expect


def test_tf_idf_top_terms_oracle(docs_df):
    out = rep.tf_idf_top_terms(docs_df, k=2).toPandas()
    # python reference
    tf: dict[tuple[int, str], int] = Counter()
    docfreq: Counter = Counter()
    for doc_id, text in DOCS:
        terms = [t for t in text.split(" ") if t]
        for t in terms:
            tf[(doc_id, t)] += 1
        docfreq.update(set(terms))
    n_docs = len(DOCS)
    scored: dict[int, list[tuple[str, float, int, int]]] = {}
    for (doc_id, t), f in tf.items():
        s = _r4(f * (math.log((n_docs + 1) / (docfreq[t] + 1)) + 1.0))
        scored.setdefault(doc_id, []).append((t, s, f, docfreq[t]))
    for doc_id, rows in scored.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        top = rows[:2]
        got = out[out.doc_id == doc_id].sort_values(
            ["tfidf", "term"], ascending=[False, True]
        )
        assert [
            (r.term, r.tfidf, r.tf, r.df_docs) for r in got.itertuples()
        ] == [(t, s, f, d) for t, s, f, d in top], doc_id
    # empty-text doc contributes no terms
    assert 4 not in set(out["doc_id"])


def test_corpus_filter_oracle(spark):
    docs = [
        (0, " ".join(f"word{i}" for i in range(60))),       # clean: keep
        (1, " ".join(["x"] * 60)),                          # dup words + grams
        (2, "short doc"),                                   # word_count
        (3, " ".join(["abcdefghijklmno"] * 55)),            # long words + dups
        (4, ""),                                            # empty
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    out = rep.corpus_filter(df).toPandas().set_index("doc_id").sort_index()

    def expect(text):
        words = text.split(" ")
        nw, nc = len(words), max(len(text), 1)
        reasons = []
        if nw < 50 or nw > 100_000:
            reasons.append("word_count")
        mwl = sum(len(w) for w in words) / max(nw, 1)
        if mwl < 3.0:
            reasons.append("mean_word_len_low")
        if mwl > 10.0:
            reasons.append("mean_word_len_high")
        if (nw - len(set(words))) / max(nw, 1) > 0.5:
            reasons.append("dup_words")
        if _top_chars(words, 2) / nc > 0.20:
            reasons.append("top_bigram")
        if min(_dup_chars(words, 5) / nc, 1.0) > 0.15:
            reasons.append("dup_5grams")
        return ",".join(reasons)

    for doc_id, text in docs:
        r = expect(text)
        assert out.loc[doc_id, "reasons"] == r, (doc_id, r)
        assert out.loc[doc_id, "keep"] == (r == ""), doc_id
    assert out.loc[0, "keep"] and not out.loc[1, "keep"]


def test_corpus_filter_shuffle_free(docs_df):
    plan = docs_df._sc._jvm.PythonSQLUtils.explainString(
        rep.corpus_filter(docs_df)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- PII scrub

def test_scrub_pii_masks_and_counts(spark):
    rows = [
        (0, "mail me at alice.smith+x@sub.example.org today"),
        (1, "server 10.0.255.3 and backup 192.168.1.77 up"),
        (2, "card 12345678 pin 9999 ok 123"),  # 123 too short for NUM
        (3, "clean text with no findings"),
        (4, "bob@x.io at 8.8.8.8 acct 00001234"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = ts_ops.scrub_pii(df).toPandas().set_index("doc_id").sort_index()
    assert out.loc[0, "masked"] == "mail me at <EMAIL> today"
    assert out.loc[0, ["n_email", "n_ipv4", "n_number"]].tolist() == [1, 0, 0]
    assert out.loc[1, "masked"] == "server <IP> and backup <IP> up"
    assert out.loc[1, ["n_email", "n_ipv4", "n_number"]].tolist() == [0, 2, 0]
    assert out.loc[2, "masked"] == "card <NUM> pin <NUM> ok 123"
    assert out.loc[2, ["n_email", "n_ipv4", "n_number"]].tolist() == [0, 0, 2]
    assert out.loc[3, "masked"] == rows[3][1]
    assert out.loc[3, ["n_email", "n_ipv4", "n_number"]].tolist() == [0, 0, 0]
    assert out.loc[4, "masked"] == "<EMAIL> at <IP> acct <NUM>"


def test_scrub_pii_order_email_before_num(spark):
    # digits inside an email local part must be swallowed by <EMAIL>,
    # not partially rewritten by the digit-run rule.
    df = spark.createDataFrame(
        pd.DataFrame([(0, "u123456@example.com")], columns=["doc_id", "text"])
    )
    out = ts_ops.scrub_pii(df).toPandas().iloc[0]
    assert out["masked"] == "<EMAIL>"
    assert out["n_email"] == 1 and out["n_number"] == 1  # counts on ORIGINAL


def test_scrub_pii_counts_match_python_re(spark):
    text = "a@b.co 1.2.3.4 55555 x@y.org 10.20.30.40 1234567 z"
    df = spark.createDataFrame(
        pd.DataFrame([(0, text)], columns=["doc_id", "text"])
    )
    out = ts_ops.scrub_pii(df).toPandas().iloc[0]
    for name, pat, _ in ts_ops.PII_PATTERNS:
        assert out[f"n_{name}"] == len(re.findall(pat, text)), name


# ---------------------------------------------------------- plan quality

def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_repetition_stats_shuffle_free(docs_df):
    plan = _plan(rep.repetition_stats(docs_df))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scrub_pii_shuffle_free(docs_df):
    plan = _plan(ts_ops.scrub_pii(docs_df))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------- collocations

def test_pmi_collocations_exact_values(spark):
    # corpus: T=7 tokens (a:3 b:3 c:1), B=5 bigrams,
    # counts (a,b):3 (b,a):1 (b,c):1
    df = spark.createDataFrame(
        pd.DataFrame([(0, "a b a b"), (1, "a b c")], columns=["doc_id", "text"])
    )
    out = (
        rep.pmi_collocations(df, k=10, min_count=1)
        .toPandas()
        .set_index(["w1", "w2"])
    )
    assert round(math.log(3 * 49 / (5 * 3 * 3)), 4) == out.loc[("a", "b"), "pmi"]
    assert round(math.log(1 * 49 / (5 * 3 * 3)), 4) == out.loc[("b", "a"), "pmi"]
    assert round(math.log(1 * 49 / (5 * 3 * 1)), 4) == out.loc[("b", "c"), "pmi"]
    # tie at the top: ("a","b") and ("b","c") share a PMI; (pmi desc, w1, w2)
    # puts ("a","b") first
    top = rep.pmi_collocations(df, k=1, min_count=1).toPandas()
    assert (top.iloc[0]["w1"], top.iloc[0]["w2"]) == ("a", "b")


def test_pmi_min_count_prunes_pairs_not_scores(spark):
    # B and T are pre-prune totals: raising min_count drops rows but must
    # NOT change the PMI of a surviving pair.
    df = spark.createDataFrame(
        pd.DataFrame([(0, "a b a b"), (1, "a b c")], columns=["doc_id", "text"])
    )
    loose = (
        rep.pmi_collocations(df, k=10, min_count=1)
        .toPandas()
        .set_index(["w1", "w2"])
    )
    strict = rep.pmi_collocations(df, k=10, min_count=2).toPandas()
    assert len(strict) == 1
    assert strict.iloc[0]["pair_count"] == 3
    assert strict.iloc[0]["pmi"] == loose.loc[("a", "b"), "pmi"]


def test_pmi_skips_empty_tokens_and_short_docs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, "a  b"), (1, ""), (2, "solo")], columns=["doc_id", "text"]
        )
    )
    out = rep.pmi_collocations(df, k=10, min_count=1).toPandas()
    # double space must not create an empty token; "" and 1-token docs
    # contribute no bigrams -> single (a,b) pair over T=3, B=1
    assert len(out) == 1
    assert (out.iloc[0]["w1"], out.iloc[0]["w2"]) == ("a", "b")
    assert out.iloc[0]["pmi"] == round(math.log(1 * 9 / (1 * 1 * 1)), 4)
