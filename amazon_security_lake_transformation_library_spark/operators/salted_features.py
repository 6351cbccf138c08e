"""Hot-entity-safe (salted) variant of the flagship per-turn feature block.

``features.build_turn_features`` partitions the window by ``conv_id``; a
conversation holding 10% of all rows serializes into one task and caps
scaling (AQE cannot split window partitions). This module computes the SAME
feature block with the classic two-pass parallel-scan decomposition, fused
so the whole thing costs:

  * ONE shuffle of the big table on ``(entity, chunk)`` (the pass-1 window;
    the carry groupBy and the final join REUSE that partitioning — no
    further big-table exchange);
  * ONE tiny per-(entity, chunk) carry aggregate whose prefix-combine runs
    as an unskewed window over the carry frame (rows = n_chunks);
  * ONE join of the carry frame back onto the big table.

Session boundaries crossing chunks are resolved INSIDE the carry frame: the
flag of a chunk's first row is ``gap(first.ts, prev_chunk.last.ts)``, so
per-chunk flag totals = interior flags (pass 1) + boundary flag (carry
frame) and no second pass over the big table is needed.

``persist=True`` caches the pass-1 frame before it branches into
(carry-aggregate, join-probe); the default recomputes the window for each
consumer instead. With zstd shuffle compression (session default) the
recompute is CHEAPER than materializing the wide frame — measured 69s vs
80s at 4 cores and 36s vs 57s at 16 cores on 12.7M turns (BASELINE.md
§4.2) — because the persisted blocks thrash executor storage memory while
the recompute rides the already-compressed shuffle. Flip it per workload.

The chunk id must be NON-DECREASING along the window order within each
entity (``salted.turn_chunk`` / ``salted.time_chunk`` both qualify; equal-ts
ties always share a time chunk, preserving the (ts, turn_idx) tie-break).

Equality with the unsalted block is property-tested in
tests/test_salted_features.py over the skewed synthetic fixture.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persist_tracked
from pyspark.storagelevel import StorageLevel

from ..functions.timeops import epoch_seconds

_CHUNK = "__salt_chunk"


def build_turn_features_salted(
    df: DataFrame,
    chunk: Column,
    gap_seconds: int = 1800,
    entity: str = "conv_id",
    order: Sequence[str] = ("ts", "turn_idx"),
    text_col: str = "text",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    persist: bool = False,
) -> DataFrame:
    """Same output schema/values as ``features.build_turn_features`` but the
    hot entity spreads across tasks. See module docstring for the plan."""
    ordc = [F.col(c) for c in order]
    d = df.withColumn(_CHUNK, chunk)

    w = Window.partitionBy(entity, _CHUNK).orderBy(*order)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    text_len = F.length(F.col(text_col))
    user_ind = (F.col(role_col) == "user").cast("long")

    # ---- pass 1: per-chunk partials (the only big-table window) ----------
    prev_ts_p = F.lag(F.col(ts_col)).over(w)
    gap_p = epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts_p)
    # interior flag: valid for every row except the chunk's first (rn==1),
    # whose true previous row lives in the previous chunk
    flag_int = F.when(prev_ts_p.isNotNull() & (gap_p > float(gap_seconds)), 1).otherwise(0)
    d = d.select(
        "*",
        text_len.alias("text_len"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
        F.lag(F.col(role_col)).over(w).alias("__prev_role_p"),
        F.lag(text_len).over(w).alias("__prev_len_p"),
        prev_ts_p.alias("__prev_ts_p"),
        F.lead(F.col(role_col)).over(w).alias("__next_role_p"),
        F.last(F.col(tool_col), ignorenulls=True).over(wc).alias("__ffill_p"),
        F.sum(user_ind).over(wc).alias("__user_cum_p"),
        F.sum(flag_int).over(wc).alias("__flag_cum_int"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(entity, _CHUNK)
        ).alias("__chunk_n"),
    )
    if persist:
        d = persist_tracked(d, StorageLevel.MEMORY_AND_DISK)

    # ---- per-chunk summaries -> prefix-combined carries ------------------
    # (groupBy keys == pass-1 partitioning -> no big-table exchange)
    sums = d.groupBy(entity, _CHUNK).agg(
        F.sum(user_ind).alias("__user_sum"),
        F.max(F.col("__flag_cum_int")).alias("__flag_int_sum"),
        F.min(F.struct(*ordc, F.col(role_col).alias("role"),
                       F.col(ts_col).alias("ts_v"))).alias("__first"),
        F.max(F.struct(*ordc, F.col(role_col).alias("role"),
                       text_len.alias("tlen"),
                       F.col(ts_col).alias("ts_v"))).alias("__last"),
        F.max(
            F.when(F.col(tool_col).isNotNull(),
                   F.struct(*ordc, F.col(tool_col).alias("v")))
        ).alias("__ltool"),
    )

    wb = Window.partitionBy(entity).orderBy(_CHUNK)
    wb_prev = wb.rowsBetween(Window.unboundedPreceding, -1)
    prev_last = F.lag(F.col("__last")).over(wb)
    # boundary flag of THIS chunk's first row, resolved in the carry frame
    bgap = epoch_seconds(F.col("__first.ts_v")) - epoch_seconds(prev_last["ts_v"])
    bflag = F.when(prev_last.isNull() | (bgap > float(gap_seconds)), 1).otherwise(0)
    chunk_flags = F.col("__flag_int_sum") + bflag

    carries = sums.select(
        entity,
        _CHUNK,
        F.sum("__user_sum").over(wb_prev).alias("__user_carry"),
        prev_last.alias("__prev_last"),
        F.lead(F.col("__first")).over(wb).alias("__next_first"),
        F.last(F.col("__ltool"), ignorenulls=True).over(wb_prev)["v"]
        .alias("__tool_carry"),
        bflag.alias("__bflag"),
        (F.sum(chunk_flags).over(wb) - chunk_flags).alias("__flag_carry"),
    )

    # carry frame is one row per (entity, chunk): often broadcast-able, but
    # at 10^12-turn scale it is not — no hint; both sides hash-partition on
    # the join keys and AQE downgrades to broadcast when it is small.
    j = d.join(carries, [entity, _CHUNK])

    # ---- combine: boundary rows take their neighbor chunk's edge row -----
    is_first = F.col("__rn") == 1
    prev_role = F.when(is_first, F.col("__prev_last.role")).otherwise(F.col("__prev_role_p"))
    prev_len = F.when(is_first, F.col("__prev_last.tlen")).otherwise(F.col("__prev_len_p"))
    next_role = F.when(
        F.col("__rn") == F.col("__chunk_n"), F.col("__next_first.role")
    ).otherwise(F.col("__next_role_p"))

    session_cum = (
        F.col("__flag_cum_int") + F.col("__bflag") + F.col("__flag_carry")
    )

    out_cols = [c for c in df.columns] + ["text_len", "n_tokens"]
    return j.select(
        *out_cols,
        prev_role.alias("prev_role"),
        prev_len.alias("prev_text_len"),
        next_role.alias("next_role"),
        F.coalesce(F.col("__ffill_p"), F.col("__tool_carry")).alias("tool_ffill"),
        (session_cum - F.lit(1)).cast("long").alias("session_id"),
        (
            F.col("__user_cum_p") + F.coalesce(F.col("__user_carry"), F.lit(0))
        ).alias("user_turn_cum"),
    )
