"""Lexical retrieval over a document corpus: BM25 scoring / top-k and a
kNN label-consistency evaluation metric for embedding spaces.

A training-data pipeline at corpus scale needs a retrieval surface twice:
once for curation (find documents about X to up/down-sample, locate eval
contamination beyond exact n-grams) and once for evaluating learned
embeddings (does nearest-neighbor structure respect labels?). The
reference library has no retrieval surface at all (its
transformation_function only normalizes rows into OCSF); this module is
part of the training-pipeline extension inventoried in SURVEY.md §2.D.

Design for scale
----------------
* ``bm25_topk`` — the naive formulation builds an exploded (doc, term)
  posting table and shuffles it twice (df aggregate, then score join).
  For the ad-hoc-query case the engine instead exploits that the query
  is a SMALL constant set of terms: per-term term frequency is computed
  *in-row* with ``size(filter(tokens, t = term))`` (a JVM higher-order
  function — zero explode, zero shuffle), corpus statistics
  (N, avgdl, per-term document frequency) reduce to ONE scalar aggregate
  (map-side partial, a handful of doubles), and the stats row is
  broadcast back with a literal cross join. Total cost: two corpus scans,
  no wide shuffle, top-k via a global ``TakeOrderedAndProject`` (never a
  full sort). At 100 TB both scans are column-pruned to (doc_id, text).
* ``knn_label_metrics`` — composes the exact ``cosine_topk`` kernel
  (query side broadcast, corpus scanned once) with a label join on the
  |queries × k|-sized neighbor table, then one tiny per-label aggregate.
  The expensive part inherits cosine_topk's scale shape; everything
  after it is query-set-sized.

* ``ranking_metrics`` — offline evaluation of ANY ranked run against a
  relevance-judgment table (the TREC qrels shape): per-query MRR,
  graded nDCG@k, precision/recall@k. The run and qrels tables are
  retrieval-output-sized (|queries| × k and |judgments|), orders of
  magnitude below the corpus, so the equi-joins and per-query windows
  here are cheap by construction; the corpus never participates.

All are deterministic functions of the input set (scores are fixed
left-to-right double expressions, ties broken on ids), so the DuckDB
differential oracle replays them in ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bm25_topk",
    "bm25_topk_multi",
    "knn_label_metrics",
    "ranking_metrics",
]

_TOKEN_RE = "[^a-z0-9]+"


def _tokens(text_col):
    """Lowercased alphanumeric tokens, empties dropped (regex split keeps
    leading/trailing empty strings on both engines)."""
    return F.filter(
        F.split(F.lower(text_col), _TOKEN_RE), lambda x: x != F.lit("")
    )


def _term_freq(toks_col, term: str):
    # Single-arg lambda only: a second lambda parameter would be bound to
    # the element INDEX by Spark's higher-order-function protocol.
    return F.size(F.filter(toks_col, lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score against a constant term set.

    Returns (rank, <id_col>, score) with score rounded to 4 decimals;
    ranking is on the rounded score with id tiebreak so the order is
    insensitive to sub-1e-4 float noise. Documents matching no query
    term (score 0) are excluded.

    idf uses the non-negative Robertson–Sparck-Jones form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = list(dict.fromkeys(query_terms))  # stable-order dedup

    toks = docs.select(
        F.col(id_col),
        _tokens(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").cast("double").alias("_dl"),
        *[
            _term_freq(F.col("_toks"), t).cast("double").alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )

    # ONE scalar aggregate for every corpus statistic the formula needs.
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = toks.crossJoin(F.broadcast(stats))
    # Fixed left-to-right sum over the constant term list — the same
    # association order the SQL oracle writes, so doubles agree bit-wise.
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        tf = F.col(f"_tf_{i}")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom

    out = (
        scored.select(F.col(id_col), F.round(score, 4).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    # The window runs AFTER the global limit — k rows, one task.
    return out.select(
        F.row_number().over(w).alias("rank"), id_col, "score"
    )


def knn_label_metrics(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label kNN consistency of an embedding space.

    For each query vector: exact top-k cosine neighbors (self excluded,
    via similarity.cosine_topk — broadcast queries, one corpus scan),
    then per query ``precision@k`` (share of neighbors sharing the
    query's label) and ``reciprocal rank`` of the first same-label
    neighbor (0 when none). Returns one row per query label:
    (label, n_queries, p_at_k, mrr), metrics rounded to 4 decimals.

    This is the standard embedding-quality gate a dedup/curation
    pipeline runs before trusting cosine thresholds at corpus scale.
    """
    from .similarity import cosine_topk

    topk = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    labels = emb.select(F.col(id_col), F.col(label_col))
    joined = (
        topk.join(
            F.broadcast(labels.withColumnRenamed(label_col, "_q_label")),
            topk.query_id == F.col(id_col),
        )
        .drop(id_col)
        .join(
            F.broadcast(labels.withColumnRenamed(label_col, "_n_label")),
            topk.neighbor_id == F.col(id_col),
        )
        .drop(id_col)
    )
    per_query = joined.groupBy("query_id", "_q_label").agg(
        (F.sum((F.col("_n_label") == F.col("_q_label")).cast("double")) / k).alias(
            "_p"
        ),
        F.coalesce(
            F.lit(1.0)
            / F.min(
                F.when(F.col("_n_label") == F.col("_q_label"), F.col("rank"))
            ),
            F.lit(0.0),
        ).alias("_rr"),
    )
    return (
        per_query.groupBy(F.col("_q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(F.avg("_p"), 4).alias("p_at_k"),
            F.round(F.avg("_rr"), 4).alias("mrr"),
        )
    )


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query ranking-quality metrics of a retrieval ``run`` against
    graded relevance judgments ``qrels`` at cutoff ``k``.

    ``run``: one row per (query, retrieved doc) with a 1-based
    ``rank_col``. ``qrels``: one row per judged (query, doc) with an
    integer/double grade ``rel_col`` (> 0 means relevant). Returns one
    row per query that has at least one relevant judgment:

    - ``rr`` — reciprocal rank of the first relevant retrieved doc at
      ANY rank (the MRR convention), 0.0 when none retrieved;
    - ``ndcg_k`` — graded nDCG@k with gain ``2^rel - 1`` and discount
      ``log2(rank + 1)``; the ideal DCG takes the query's top-k grades
      in descending order;
    - ``precision_k`` = relevant-retrieved-in-top-k / k;
    - ``recall_k`` = relevant-retrieved-in-top-k / n_rel.

    Doubles are rounded to 4 decimals. Metrics over queries (the MRR /
    mean-nDCG headline numbers) are one further tiny aggregate the
    caller can take; returning per-query rows keeps the differential
    surface wide.

    Plan shape: LEFT join qrels onto the run rows on (query, doc) —
    both tables are retrieval-sized, the corpus is never touched; ideal
    DCG is one row_number window over qrels partitioned by query (the
    per-query judgment list is small by construction — a query with
    millions of judgments is a data bug, not a workload); one hash agg
    per side, one final join on query. Everything is JVM expressions.
    """
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    gain = F.pow(F.lit(2.0), F.col(rel_col)) - 1.0

    rel_only = qrels.filter(F.col(rel_col) > 0).select(
        q.alias("_q"), d.alias("_d"), F.col(rel_col).alias("_rel")
    )

    # run rows annotated with their judgment (NULL grade = not judged /
    # not relevant). Join keys are composite → one narrow shuffle of two
    # retrieval-sized tables.
    hits = run.select(q.alias("_q"), d.alias("_d"), r.alias("_rank")).join(
        rel_only, ["_q", "_d"], "left"
    )
    per_q = hits.groupBy("_q").agg(
        F.coalesce(
            1.0 / F.min(F.when(F.col("_rel").isNotNull(), F.col("_rank"))),
            F.lit(0.0),
        ).alias("_rr"),
        F.sum(
            F.when(
                F.col("_rel").isNotNull() & (F.col("_rank") <= k),
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_rank") + 1.0),
            ).otherwise(F.lit(0.0))
        ).alias("_dcg"),
        F.sum(
            (F.col("_rel").isNotNull() & (F.col("_rank") <= k)).cast("long")
        ).alias("_hits_k"),
    )

    iw = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_d"))
    ideal = (
        rel_only.withColumn("_i", F.row_number().over(iw))
        .groupBy("_q")
        .agg(
            F.sum(
                F.when(
                    F.col("_i") <= k,
                    (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                    / F.log2(F.col("_i") + 1.0),
                ).otherwise(F.lit(0.0))
            ).alias("_idcg"),
            F.count(F.lit(1)).alias("n_rel"),
        )
    )

    return ideal.join(per_q, "_q", "left").select(
        F.col("_q").alias(query_col),
        "n_rel",
        F.coalesce(F.col("_hits_k"), F.lit(0)).alias("hits_k"),
        (F.round(F.coalesce(F.col("_rr"), F.lit(0.0)), 4) + 0.0).alias("rr"),
        (
            F.round(
                F.when(
                    F.col("_idcg") > 0,
                    F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"),
                ).otherwise(F.lit(0.0)),
                4,
            )
            + 0.0
        ).alias("ndcg_k"),
        (
            F.round(F.coalesce(F.col("_hits_k"), F.lit(0)) / F.lit(float(k)), 4)
            + 0.0
        ).alias("precision_k"),
        (
            F.round(
                F.coalesce(F.col("_hits_k"), F.lit(0))
                / F.col("n_rel").cast("double"),
                4,
            )
            + 0.0
        ).alias("recall_k"),
    )


def bm25_topk_multi(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Top-k documents by BM25 for MANY queries at once — the
    posting-list formulation.

    :func:`bm25_topk` exploits a single constant term set (in-row tf,
    one scalar stat aggregate, no explode). With a query WORKLOAD
    (``queries``: one row per (query_id, term)) that shape would rescan
    the corpus per query; the batch form instead builds the classic
    posting list once and joins the whole workload against it:

    1. one tokenize scan → per-doc length + exploded postings
       ``(doc_id, term, tf)`` (one shuffle keyed by (doc, term), then
       term-keyed df counts — both map-side combinable);
    2. corpus stats (N, avgdl) in a broadcast scalar aggregate;
    3. score = postings ⋈ broadcast(queries) ⋈ df(term) ⋈ dl(doc) —
       the term join PRUNES the posting list to workload terms before
       anything wide happens, so the scored table is
       |workload terms × matching docs|, not the corpus;
    4. per-(query, doc) sum, then top-k per query via a rank window on
       the ROUNDED (4 dp) score with doc-id tiebreak — rank-limit
       pushdown (WindowGroupLimit) keeps the shuffle at
       O(queries × k'), and ordering on the rounded score makes the
       ranking insensitive to float summation order across engines.

    Returns (query_id, rank, doc_id, score); zero-score docs excluded.
    Same non-negative RSJ idf as :func:`bm25_topk`.
    """
    toks = docs.select(
        F.col(id_col),
        _tokens(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        "_toks",
        F.size("_toks").cast("double").alias("_dl"),
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    q = queries.select(F.col(query_id_col), F.col(term_col)).distinct()
    qterms = q.select(term_col).distinct()
    # Workload-term pruning BEFORE the posting aggregate: the exploded
    # stream drops every non-workload term map-side (broadcast semi
    # join), so the (doc, term) shuffle carries only |workload terms ×
    # matching docs| rows — never the corpus vocabulary.
    post = (
        toks.select(
            F.col(id_col), "_dl", F.explode("_toks").alias(term_col)
        )
        .join(F.broadcast(qterms), term_col, "left_semi")
        .groupBy(id_col, term_col)
        .agg(
            F.count(F.lit(1)).cast("double").alias("_tf"),
            F.first("_dl").alias("_dl"),
        )
    )
    # df over workload terms only -> |workload terms| rows, broadcast-safe.
    dft = post.groupBy(term_col).agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    term_score = (
        idf
        * F.col("_tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("_tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
    )
    scored = (
        post.join(F.broadcast(q), term_col)
        .join(F.broadcast(dft), term_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(term_score).alias("_score"))
        .select(
            query_id_col,
            id_col,
            F.round("_score", 4).alias("score"),
        )
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )
