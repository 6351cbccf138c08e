"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The 10^12-turn lakehouse reads with two different access patterns: the
feature build scans by ``conv_id`` (served by the bucketed layout,
plans/bucketed.py), but ad-hoc curation/debug queries slice by OTHER
dimensions — a user, a time range, a value band. A table sorted on one
column serves one pattern; Z-ordering interleaves the bits of several
columns' fixed-point ranks so rows close in ANY clustered dimension land
in few files, letting min/max file statistics (parquet row-group /
Iceberg manifest pruning) skip most of the table for selective filters
on any of them. This is the OPTIMIZE ZORDER primitive of Delta/Iceberg,
re-expressed as plain DataFrame ops.

Scale design: quantization stats are ONE scalar aggregate (map-side
partial, 2 doubles per dimension) broadcast back; the key itself is a
pure JVM bit-expression (constant-folded shift/and/or chain — no Python,
no shuffle); the re-layout is ONE ``repartitionByRange`` on the key
(sampled range boundaries, the same machinery a global sort uses) +
``sortWithinPartitions`` so every output file covers a tight Z-range.
Total cost: one stat scan + one shuffle — identical plan shape at 100 TB.

The reference library's writer partitions by (source, eventday) only
(``transformation_function/app.py`` sink — SURVEY.md §2.A A20); this
module is part of the lakehouse-maintenance extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout", "bucket_spans"]


def _quantize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Fixed-point rank of ``col`` in [0, 2^bits): linear min-max scale,
    floor to integer. Degenerate dimension (mn == mx) ranks to 0. The
    arithmetic is plain IEEE double expressions so the DuckDB oracle can
    replay it verbatim."""
    scale = float((1 << bits) - 1)
    v = col.cast("double")
    return (
        F.when(
            mx > mn,
            F.floor((v - mn) / (mx - mn) * F.lit(scale)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
) -> DataFrame:
    """Append ``z_key``: the Morton interleave of each column's
    ``bits``-bit fixed-point rank (column i contributes bit ``b`` of its
    rank at output position ``b * len(cols) + i``).

    ``bits * len(cols)`` must fit in a signed long (<= 62). NULLs in a
    clustered column rank as 0 (they cluster together at the low end,
    which is exactly what file-skipping wants).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    stats = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    )
    j = df.crossJoin(F.broadcast(stats))
    ranks = [
        F.coalesce(
            _quantize(
                F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits
            ),
            F.lit(0).cast("long"),
        )
        for c in cols
    ]
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return j.select(*df.columns, z.alias("z_key"))


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` for multi-dimensional file skipping: compute the
    Z-key, range-partition on it (each output partition = one tight
    Z-range = one file after write), sort within partitions so row-group
    stats are tight too. Write the result with the engine's partitioned
    writer (plans/writer.py) to make it durable."""
    out = zorder_key(df, cols, bits=bits)
    parts = [F.col("z_key")]
    if num_files:
        return out.repartitionByRange(num_files, *parts).sortWithinPartitions(
            "z_key"
        )
    return out.repartitionByRange(*parts).sortWithinPartitions("z_key")


def bucket_spans(
    df_with_z: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    bucket_bits: int = 4,
) -> DataFrame:
    """Layout-quality diagnostic: bucket rows by the TOP ``bucket_bits``
    of ``z_key`` (a stand-in for "file") and report each bucket's
    per-dimension min/max span. Tight spans = effective min/max pruning.
    One hash aggregate over (2^bucket_bits) groups."""
    cols = list(cols)
    total_bits = bits * len(cols)
    bucket = F.shiftright(F.col("z_key"), total_bits - bucket_bits).alias(
        "z_bucket"
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df_with_z.groupBy(bucket).agg(*aggs)
