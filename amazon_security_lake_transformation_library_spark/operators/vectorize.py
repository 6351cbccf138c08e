"""Sparse feature vectorization — the hashing trick and bounded-vocab
multi-hot encoding.

* ``hash_feature_rows`` / ``hash_features_vec`` — the hashing trick
  (Weinberger et al. 2009): categorical ``col=value`` pairs map to a
  fixed ``dim``-bucket index via md5, with a ±1 sign hash so collisions
  cancel in expectation instead of biasing upward. No vocabulary is
  fit, so the op is a PURE NARROW PROJECTION — at 100 TB it pipelines
  inside the scan with zero shuffle and zero fit pass, which is the
  whole reason the trick exists at scale.
* ``build_vocab`` / ``encode_multihot`` — classic bounded vocabulary:
  top-V tokens by document frequency (ties broken by token text, so
  the index assignment is deterministic on any engine), then each doc
  becomes its sorted list of present vocab indices plus an OOV count.
  The vocab is a V-row dimension table (broadcast); the encode is one
  explode + broadcast join + one doc_id fold-back.

Determinism contract: hash index = ``int(md5(salt||col||'='||value)[:8],
16) % dim``; sign from the 9th hex nibble (< '8' → +1). Both are
reproducible in ANSI SQL (DuckDB: ``('0x'||substr(md5(..),1,8))::BIGINT
% dim``). Vocab rank = ``row_number`` over ``(df DESC, token ASC)``.

Reference parity: no analog in the reference library (it has no
feature surface); part of the training-pipeline family (SURVEY §2.D).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_index",
    "hash_sign",
    "hash_feature_rows",
    "hash_features_vec",
    "build_vocab",
    "encode_multihot",
    "linear_score",
    "deterministic_weights",
]


def hash_index(col_name: str, value: Column, dim: int, salt: str) -> Column:
    """Bucket index of ``col=value`` in ``0..dim-1`` (long)."""
    h = F.md5(F.concat(F.lit(salt), F.lit(col_name), F.lit("="),
                       value.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim


def hash_sign(col_name: str, value: Column, salt: str) -> Column:
    """±1 sign hash from the 9th md5 hex nibble — independent of the
    index bits, so colliding features carry independent signs."""
    h = F.md5(F.concat(F.lit(salt), F.lit(col_name), F.lit("="),
                       value.cast("string")))
    return F.when(F.substring(h, 9, 1) < "8", F.lit(1)).otherwise(F.lit(-1))


def hash_feature_rows(
    df: DataFrame,
    id_col: str,
    cols: Sequence[str],
    dim: int = 1024,
    salt: str = "fh-v1",
) -> DataFrame:
    """Exploded hashed-feature stream ``(id, feature, idx, sign)`` — one
    row per (input row, feature column); NULL feature values emit no
    row (a NULL carries no feature mass). Pure projection + in-row
    explode: zero shuffle, zero fit."""
    if not 1 <= dim <= (1 << 31):
        raise ValueError("dim out of range")
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("feature"),
            hash_index(c, F.col(c), dim, salt).alias("idx"),
            hash_sign(c, F.col(c), salt).alias("sign"),
        )
        for c in cols
    ])
    present = F.filter(entries, lambda e: e["idx"].isNotNull())
    return df.select(F.col(id_col), F.explode(present).alias("_e")).select(
        id_col,
        F.col("_e.feature").alias("feature"),
        F.col("_e.idx").alias("idx"),
        F.col("_e.sign").alias("sign"),
    )


def hash_features_vec(
    df: DataFrame,
    id_col: str,
    cols: Sequence[str],
    dim: int = 1024,
    salt: str = "fh-v1",
    out_col: str = "features",
) -> DataFrame:
    """In-row sparse vector form: ``(…row…, features: array<struct<idx,
    val>>)`` sorted by idx with same-index collisions SUMMED in-row
    (signs cancel, the hashing-trick contract). Still a pure
    projection — the merge is an in-row fold over a ``len(cols)``-sized
    array, never a shuffle. Equivalent to grouping
    :func:`hash_feature_rows` by (id, idx) and summing signs."""
    entries = F.array(*[
        F.struct(
            hash_index(c, F.col(c), dim, salt).alias("idx"),
            hash_sign(c, F.col(c), salt).cast("long").alias("val"),
        )
        for c in cols
    ])
    srt = F.array_sort(F.filter(entries, lambda e: e["idx"].isNotNull()))
    # fold: merge runs of equal idx (input sorted, so collisions adjoin)
    merged = F.aggregate(
        srt,
        F.array().cast("array<struct<idx:long,val:long>>"),
        lambda acc, e: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1)["idx"] == e["idx"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    e["idx"].alias("idx"),
                    (F.element_at(acc, -1)["val"] + e["val"]).alias("val"),
                )),
            ),
        ).otherwise(F.concat(acc, F.array(e))),
    )
    return df.withColumn(out_col, merged)


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 256,
) -> DataFrame:
    """Top-V vocabulary by DOCUMENT frequency: ``(token, vocab_idx,
    doc_freq)`` with ``vocab_idx`` = dense 0-based rank over
    ``(doc_freq DESC, token ASC)`` — fully deterministic under ties.

    Shape: explode → distinct(doc, token) → token hash-agg →
    one V-row rank. The rank window is over the |distinct tokens|
    table (vocabulary-sized, NOT corpus-sized) and is cut to top_v by
    a WindowGroupLimit-style filter, so the single-partition window
    never sees the corpus."""
    toks = docs.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            )
        ).alias("token"),
    )
    dfreq = toks.groupBy("token").agg(F.count("*").alias("doc_freq"))
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("token").asc())
    ranked = dfreq.withColumn("vocab_idx", F.row_number().over(w) - 1)
    return ranked.filter(F.col("vocab_idx") < top_v).select(
        "token", "vocab_idx", "doc_freq"
    )


def encode_multihot(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-hot encode against a fitted vocabulary: ``(id, idxs:
    array<long> sorted ascending, n_oov)`` where ``n_oov`` counts the
    doc's DISTINCT tokens not in the vocab. Explode distinct tokens →
    broadcast LEFT join the V-row vocab → one id fold-back
    (sort_array over collect_list keeps the output order-deterministic
    under any partitioning)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            )
        ).alias("token"),
    )
    j = toks.join(F.broadcast(vocab.select("token", "vocab_idx")),
                  "token", "left")
    return j.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.col("vocab_idx").cast("long"))
        ).alias("idxs"),
        F.sum(F.when(F.col("vocab_idx").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"),
    )


def linear_score(
    df: DataFrame,
    cols: Sequence[str],
    weights: DataFrame,
    dim: int = 64,
    salt: str = "fh-v1",
    id_col: str = "event_id",
    bias: float = 0.0,
    out_col: str = "score",
) -> DataFrame:
    """Linear-classifier inference over hashing-trick features — the
    fastText-style quality-classifier scoring pass every corpus curation
    pipeline runs (e.g. the GPT-3 WebText quality filter): ``score =
    sigmoid(bias + Σ sign(f)·w[idx(f)])`` for each row's hashed features.

    Scale shape: the model IS a ``dim``-row table (idx → w) — broadcast;
    inference is the exploded hashed-feature stream (one projection)
    joined to the broadcast weight table and folded back with one
    id-keyed hash aggregate. No Python in the row path, no weight
    array on the driver; swapping models = swapping a tiny table.
    Rows with no non-null features score sigmoid(bias) via the left
    join + zero-coalesce on the id spine.
    """
    feats = hash_feature_rows(df, id_col, cols, dim=dim, salt=salt)
    w = F.broadcast(weights.select(
        F.col("idx").alias("_widx"), F.col("w").alias("_w")))
    contrib = (
        feats.join(w, feats["idx"] == F.col("_widx"), "inner")
        .groupBy(id_col)
        .agg(F.sum(F.col("sign") * F.col("_w")).alias("_dot"))
    )
    spine = df.select(id_col).distinct()
    z = F.lit(float(bias)) + F.coalesce(F.col("_dot"), F.lit(0.0))
    return (
        spine.join(contrib, id_col, "left")
        .select(id_col, (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(out_col))
    )


def deterministic_weights(spark, dim: int = 64, salt: str = "w-v1") -> DataFrame:
    """A reproducible stand-in weight table (idx, w) with w in [-1, 1):
    w = (first-8-hex of md5(salt||idx) / 2^32) * 2 - 1. Real pipelines
    load trained weights; this generator exists so tests and the DuckDB
    differential oracle can rebuild the identical model anywhere."""
    idx = spark.range(dim).select(F.col("id").cast("long").alias("idx"))
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("idx").cast("string")))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(1 << 32))
    return idx.select("idx", (u * F.lit(2.0) - F.lit(1.0)).alias("w"))
