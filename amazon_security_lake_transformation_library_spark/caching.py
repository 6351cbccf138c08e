"""Tracked persist: registry of cached intermediates owned by operators.

Several operators persist a small intermediate that both sides of a
self-join consume (LSH buckets, SimHash signatures, IVF assignments,
candidate shingle sets). The persist is load-bearing — without it the
upstream lineage executes twice — but the handle is internal to the
operator, so a long-lived session running many queries would accumulate
cached blocks that evict each other and spill.

Convention: operators call :func:`persist_tracked` instead of
``df.persist()``; batch drivers (bench.py, notebook loops) call
:func:`release_all` once the query's action has completed. Releasing is
safe at any point — an unpersisted block is simply recomputed if a
downstream action still needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register the handle for later :func:`release_all`."""
    out = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_all() -> int:
    """Unpersist every tracked intermediate (non-blocking). Returns the
    number of handles released. Idempotent; errors from already-stopped
    sessions are swallowed."""
    n = 0
    while _TRACKED:
        h = _TRACKED.pop()
        try:
            h.unpersist()
            n += 1
        except Exception:
            pass
    return n
