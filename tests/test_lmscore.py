"""Bigram-LM perplexity scoring (operators/lmscore.py). The gate query
covers self-scoring against DuckDB; these tests pin the cross-corpus
semantics (the real CCNet use: fit on clean text, score candidates),
the add-k smoothing floor for unseen bigrams/contexts, and a fully
hand-computed probability."""

import math

import pytest

from amazon_security_lake_transformation_library_spark.operators import lmscore as lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigrams_include_bos_and_skip_blank_tokens(spark):
    df = _docs(spark, [(1, "a  b a")])  # double space -> empty token dropped
    pairs = sorted(
        (r.prev, r.w) for r in lm.doc_bigrams(df).collect()
    )
    assert pairs == [("<s>", "a"), ("a", "b"), ("b", "a")]


def test_hand_computed_addk_probability(spark):
    # train: one doc "a b" -> bigrams (<s>,a),(a,b); V = {a,b} = 2
    train = _docs(spark, [(1, "a b")])
    big, ctx, vocab = lm.train_bigram_lm(train)
    # score "a b": P(a|<s>) = (1+0.5)/(1+0.5*2) = 0.75, same for P(b|a)
    out = lm.score_perplexity(_docs(spark, [(9, "a b")]), big, ctx, vocab, k=0.5)
    r = out.collect()[0]
    assert r.n_scored == 2
    assert r.avg_nll == pytest.approx(-math.log(0.75))
    assert r.ppl == pytest.approx(1 / 0.75)


def test_unseen_bigram_and_context_hit_smoothing_floor(spark):
    train = _docs(spark, [(1, "a b")])
    big, ctx, vocab = lm.train_bigram_lm(train)
    # "z q": context <s> seen (c_ctx=1) but bigram (<s>,z) unseen -> (0+k)/(1+k*V);
    # context z never seen -> (0+k)/(0+k*V) = 1/V
    out = {r.doc_id: r for r in lm.score_perplexity(
        _docs(spark, [(2, "z q")]), big, ctx, vocab, k=0.5).collect()}
    expect = (-math.log(0.5 / (1 + 0.5 * 2)) - math.log(0.5 / (0.5 * 2))) / 2
    assert out[2].avg_nll == pytest.approx(expect)


def test_out_of_domain_doc_scores_higher(spark):
    # the filter signal itself: in-domain text must get lower ppl than
    # gibberish under a model fit on the domain
    train = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
    big, ctx, vocab = lm.train_bigram_lm(train)
    out = {r.doc_id: r for r in lm.score_perplexity(
        _docs(spark, [(1, "the cat sat"), (2, "zx qv wk")]),
        big, ctx, vocab).collect()}
    assert out[1].ppl < out[2].ppl


def test_score_plan_has_no_cartesian_and_aggregates_once(spark):
    train = _docs(spark, [(1, "a b c a b")])
    big, ctx, vocab = lm.train_bigram_lm(train)
    out = lm.score_perplexity(_docs(spark, [(1, "a b")]), big, ctx, vocab)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the 1-row vocab frame must come in as a broadcast, never a
    # cartesian/nested-loop over the token stream
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
