"""CDC merge/upsert — the MERGE INTO shape (WHEN MATCHED UPDATE /
WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT) as a pure DataFrame
transform, composable with the snapshot writer (plans/writer.py) for a
copy-on-write table rewrite.

Scale design: the only join is ``base LEFT ANTI update-keys``. A CDC
batch is small relative to the table, so the distinct update-key set is
broadcast (``broadcast_updates=True``, the default) — the base table is
NEVER shuffled, the merge pipelines inside the base scan, and the output
unions the surviving updates on top. With ``broadcast_updates=False``
the anti-join falls back to a shuffled SMJ for pathological batch sizes.
Combined with a partitioned base table, Catalyst prunes untouched
partitions via the key predicate pushdown — the same effect Iceberg's
merge-on-read achieves with delete files.

The reference's writer is append-only per Lambda invoke
(transformation_function/app.py:404-411); it has no update/delete
surface at all. A feature store rebuilt continuously from CDC streams
needs exactly this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    deleted_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Apply a CDC batch to ``base``: rows whose key appears in
    ``updates`` are replaced (matched-update) or, when
    ``deleted_col`` is true on the update row, removed
    (matched-delete); update rows with unseen keys are inserted.

    ``updates`` must carry the same columns as ``base`` (plus the
    optional ``deleted_col``); the union is by name. Keys appearing on
    several update rows are all applied (callers wanting last-writer-wins
    should pre-reduce the batch with a row_number window)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    upd_keys = updates.select(*keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    kept = base.join(upd_keys, keys, "left_anti")
    if deleted_col is not None:
        live = updates.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False))
        ).drop(deleted_col)
    else:
        live = updates
    return kept.unionByName(live)
