"""Cross-document exact-substring deduplication: find token n-gram SPANS
shared across documents and scrub them — the "deduplicating training data"
pass (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") that removes memorization-prone boilerplate *within* otherwise
distinct documents, where whole-doc dedup (exact/MinHash/SimHash) cannot
reach.

Scale design
------------
* **Gram generation is a projection** (tokenize once, slice in-row) —
  zero shuffle, ~one output row per token.
* **The only corpus-sized shuffle keys on md5(gram)** — uniform 128-bit
  keys, no skew by construction; the duplicated-gram table after the
  HAVING filter is tiny next to the corpus (only grams seen in >= 2 docs
  survive), so the mark-back join is a SEMI join against a small side.
* **Span merging is in-row**: positions collect per document (bounded by
  document length — the corpus being huge does not make any single list
  big), then a single ``F.aggregate`` fold merges overlapping/adjacent
  [pos, pos+n-1] intervals into maximal spans. No window, no second
  shuffle beyond the per-doc groupBy.
* At 100 TB you raise ``n`` (Lee et al. use 50-token grams) which only
  SHRINKS the duplicated-gram table; plan shape unchanged.

Hash choice: md5 of the gram text (not xxhash64) so the differential
DuckDB oracle can reproduce every stage bit-for-bit; swap for xxhash64
on a real cluster — plan shape identical.

The reference has no dedup surface at all (SURVEY.md §2.B); this module
is part of the LLM-training-pipeline extension the rebuild adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

__all__ = ["duplicate_ngram_spans", "scrub_duplicate_spans"]

_EMPTY_SPANS = "CAST(array() AS array<struct<s:int,e:int>>)"


def _merge_fold(positions: Column, n: int) -> Column:
    """Fold a SORTED position array into maximal merged spans
    [pos, pos+n-1], merging overlapping AND adjacent intervals
    (next start <= last end + 1)."""
    def step(acc: Column, p: Column) -> Column:
        last = F.element_at(acc, -1)
        grown = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"),
                    F.greatest(last["e"], p + F.lit(n - 1)).alias("e"),
                )
            ),
        )
        fresh = F.concat(
            acc, F.array(F.struct(p.alias("s"), (p + F.lit(n - 1)).alias("e")))
        )
        return F.when(
            (F.size(acc) > 0) & (p <= last["e"] + 1), grown
        ).otherwise(fresh)

    return F.aggregate(positions, F.expr(_EMPTY_SPANS), step)


def _dup_occurrences(
    docs: DataFrame, n: int, id_col: str, text_col: str, min_docs: int
) -> DataFrame:
    """(id, pos) for every n-gram occurrence whose gram appears in at
    least ``min_docs`` distinct documents. ``pos`` is the 1-based token
    index of the gram's first token."""
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    idx = F.when(
        F.size("__t") >= n, F.sequence(F.lit(1), F.size("__t") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    # one tokenize, one in-row pass: (pos, md5(gram)) pairs zip together
    # so the token array is sliced exactly once per gram
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                idx,
                F.transform(
                    idx, lambda i: F.md5(F.concat_ws(" ", F.slice("__t", i, n)))
                ),
                lambda p, h: F.struct(p.alias("pos"), h.alias("gh")),
            )
        ).alias("o"),
    ).select(id_col, F.col("o.pos").alias("pos"), F.col("o.gh").alias("__gh"))
    dup = (
        grams.groupBy("__gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("__gh")
    )
    return grams.join(dup, "__gh", "semi").select(id_col, "pos")


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-substring spans per document.

    Returns (id, span_start, span_end): 1-based INCLUSIVE token positions
    of every maximal run of tokens covered by at least one ``n``-gram that
    occurs in >= ``min_docs`` distinct documents. Overlapping and adjacent
    gram intervals merge; a document with no duplicated grams emits no
    rows."""
    occ = _dup_occurrences(docs, n, id_col, text_col, min_docs)
    merged = (
        occ.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(F.col(id_col), F.explode(_merge_fold(F.col("ps"), n)).alias("sp"))
    )
    return merged.select(
        id_col,
        F.col("sp.s").cast("long").alias("span_start"),
        F.col("sp.e").cast("long").alias("span_end"),
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Remove duplicated spans from each document's text.

    Returns (id, clean_text, n_dropped_tokens): tokens inside any
    duplicated span are dropped, survivors re-join with single spaces
    (the tokenizer's contract); documents without duplicated spans pass
    through byte-identical with ``n_dropped_tokens = 0``."""
    occ = _dup_occurrences(docs, n, id_col, text_col, min_docs)
    spans = occ.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("ps")
    ).select(F.col(id_col), _merge_fold(F.col("ps"), n).alias("spans"))
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).join(spans, id_col, "left")
    covered = F.filter(
        F.transform(
            F.col("__t"),
            lambda x, i: F.struct(x.alias("w"), (i + 1).alias("i")),
        ),
        lambda s: ~F.exists(
            F.coalesce(F.col("spans"), F.expr(_EMPTY_SPANS)),
            lambda sp: (s["i"] >= sp["s"]) & (s["i"] <= sp["e"]),
        ),
    )
    return toks.select(
        F.col(id_col),
        F.array_join(F.transform(covered, lambda s: s["w"]), " ").alias(
            "clean_text"
        ),
        (F.size("__t") - F.size(covered)).cast("long").alias("n_dropped_tokens"),
    )
