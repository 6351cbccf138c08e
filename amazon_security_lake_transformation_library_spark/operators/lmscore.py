"""N-gram language-model quality scoring — the CCNet-style perplexity
filter (Wenzek et al. 2020: docs whose LM perplexity under a clean
reference corpus is high are likely boilerplate/gibberish and get
down-weighted or dropped).

Reference parity: the reference library (amazon-security-lake-
transformation-library) has no statistical quality scoring; this is
part of the training-data-pipeline surface the engine adds on top of
the transformation semantics (SURVEY.md §2.D).

Design (Spark-first):

* ``train_bigram_lm`` is two hash-aggregates over the exploded bigram
  stream — count(bigram) and count(context) — merged with one shuffle
  each on small keys (|distinct bigrams| ≪ corpus tokens by Heaps'
  law). The model is a TABLE, not a driver object: at 100 TB the
  bigram table is still cluster-resident and the scorer joins against
  it; nothing collects.
* ``score_perplexity`` explodes each scored doc into (prev, w) pairs,
  LEFT-joins the model (unseen bigrams and unseen contexts smooth to
  the add-k floor), and folds back with one doc_id hash-aggregate.
  Add-k smoothing: P(w | prev) = (c(prev,w) + k) / (c(prev) + k·V).
  Joins are on token-pair keys — skew on stopword contexts is bounded
  by the model side being one row per key (a dimension-shaped build
  side; Spark broadcasts it when small, SMJ otherwise).
* Tokenization is the repo-wide space-split contract (documents
  fixture is space-tokenized; see textstats) with a BOS sentinel so
  the first real token is conditioned, not skipped.

Float contract: per-token ``-ln P`` values are identical doubles on
any engine (pure rational + log); only the SUM order differs across
partitionings, so callers round the per-doc mean (the gate query
rounds to 4 decimals — error is O(1e-12) relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "doc_bigrams",
    "train_bigram_lm",
    "score_perplexity",
]

BOS = "<s>"


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, prev, w) — every consecutive token pair of every document,
    with a BOS sentinel prepended so position-0 tokens are scored.
    Pure explode (narrow until the consumer aggregates)."""
    ws = F.array_insert(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != ""),
        1,
        F.lit(BOS),
    )
    n = F.size(ws)
    pairs = F.arrays_zip(
        F.slice(ws, 1, n - 1).alias("prev"),
        F.slice(ws, 2, n - 1).alias("w"),
    )
    return docs.select(
        F.col(id_col), F.explode(pairs).alias("_p")
    ).select(id_col, F.col("_p.prev").alias("prev"), F.col("_p.w").alias("w"))


def train_bigram_lm(
    train_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the bigram table on a (clean, reference) corpus.

    Returns ``(bigram_counts, context_counts, vocab)`` where
    ``bigram_counts = (prev, w, c_big)``, ``context_counts =
    (prev, c_ctx)`` and ``vocab`` is a 1-row frame ``(v_size)`` counting
    the distinct NEXT-token vocabulary (the smoothing denominator).
    Three aggregates over one shared exploded stream; Spark reuses the
    explode via plan-level CTE when all three are consumed together.
    """
    pairs = doc_bigrams(train_docs, text_col, id_col)
    big = pairs.groupBy("prev", "w").agg(F.count("*").alias("c_big"))
    ctx = pairs.groupBy("prev").agg(F.count("*").alias("c_ctx"))
    vocab = pairs.agg(F.count_distinct("w").alias("v_size"))
    return big, ctx, vocab


def score_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document add-k bigram negative log-likelihood and perplexity
    under a fitted model: ``(id, n_scored, avg_nll, ppl)``.

    LEFT joins: a bigram unseen at fit time scores with c_big=0; a
    context unseen at fit time with c_ctx=0 — both collapse to the
    smoothing floor k/(k·V) rather than erroring or dropping the token,
    so out-of-domain docs get HIGH perplexity (the signal) instead of
    NULLs. One doc_id hash-aggregate folds tokens back to documents.
    """
    pairs = doc_bigrams(docs, text_col, id_col)
    scored = (
        pairs.join(bigram_counts, ["prev", "w"], "left")
        .join(context_counts, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(float(k))) / (
        F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(float(k)) * F.col("v_size")
    )
    nll = -F.log(p)
    out = scored.groupBy(id_col).agg(
        F.count("*").alias("n_scored"),
        F.avg(nll).alias("avg_nll"),
    )
    return out.withColumn("ppl", F.exp(F.col("avg_nll")))
