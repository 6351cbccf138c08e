"""Snapshot writer: partitioned parquet + manifest lineage, idempotent.

Replaces the reference's write path (wr.s3.to_parquet with uuid4 names,
transformation_function/app.py:404-411) which duplicates output when a
Lambda retries (SURVEY.md §4.1). Here every commit is keyed by a caller
snapshot id:

  * data lands under ``root/data/snapshot_id=<id>/<partition dirs>``
    (Hive layout; readers just read ``root/data``);
  * a retry of an uncommitted snapshot dynamically overwrites ONLY that
    snapshot's partitions (no duplicates);
  * a commit of an already-manifested snapshot is a no-op (resume);
  * the manifest (``root/_manifest``, itself parquet) records per-partition
    lineage: snapshot id, partition values, row count, write latency.

This is the Iceberg-snapshot emulation per SURVEY.md §7.4 (no Iceberg jar
offline); the API is format-agnostic so an Iceberg catalog can slot in.
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_COL = "snapshot_id"


class SnapshotWriter:
    def __init__(self, root: str):
        self.root = root
        self.data_path = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest")
        self.schema_path = os.path.join(root, "_schema")

    # -- manifest -----------------------------------------------------------

    def committed_snapshots(self, spark: SparkSession) -> set[str]:
        try:
            mdf = spark.read.parquet(self.manifest_path)
        except Exception:
            return set()
        return {r[0] for r in mdf.select(SNAPSHOT_COL).distinct().collect()}

    def manifest(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.manifest_path)
        except Exception:
            return None

    # -- commit ---------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        snapshot_id: str,
        partition_cols: Sequence[str] = (),
        bucket_col: str | None = None,
        n_buckets: int = 0,
        sort_cols: Sequence[str] = (),
        allow_spec_evolution: bool = False,
    ) -> bool:
        """Write one snapshot. Returns False (no-op) if already committed.

        ``bucket_col``/``n_buckets``: repartition so each output file holds
        a contiguous hash-bucket of entities; with ``sort_cols`` this gives
        the conv_id-bucketed, (ts, turn_idx)-sorted layout the as-of join's
        merge phase wants, and single-writer-per-partition determinism for
        the text byte-equality invariant (SURVEY.md §7.4 risk 4).

        ``allow_spec_evolution=True`` permits a partition spec that
        differs from earlier snapshots' — Iceberg partition evolution:
        the NEW spec applies to new data only, old snapshots keep their
        directory layout, and ``read()``/``read_at()`` serve both
        (grouping snapshots by spec and unioning the grouped scans;
        partition pruning still applies within each spec's group).
        Without the flag a mismatched spec is rejected BEFORE writing,
        as before — accidental evolution is a bug, deliberate evolution
        is an opt-in.
        """
        spark = df.sparkSession
        if snapshot_id in self.committed_snapshots(spark):
            return False
        # One partition spec per table unless evolution is opted into:
        # the Hive directory layout cannot mix partition depths under one
        # discovery root, so evolved tables are read per-snapshot-group
        # (see _read_snapshots). Reject a mismatched spec BEFORE writing.
        existing = self._table_partition_cols()
        if (
            existing is not None
            and list(partition_cols) != existing
            and not allow_spec_evolution
        ):
            raise ValueError(
                f"table partition spec is {existing}; got {list(partition_cols)}"
                " (pass allow_spec_evolution=True for Iceberg-style"
                " partition evolution)"
            )

        out = df.withColumn(SNAPSHOT_COL, F.lit(snapshot_id))
        if bucket_col:
            out = out.repartition(n_buckets, F.col(bucket_col))
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)

        t0 = time.monotonic()
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(SNAPSHOT_COL, *partition_cols)
            .parquet(self.data_path)
        )
        latency = time.monotonic() - t0

        # per-partition lineage from the files just written (pruned scan).
        # Explicit schema, never inference: a ZERO-ROW snapshot on a fresh
        # table writes no data files, and schema inference over the empty
        # root would throw UNABLE_TO_INFER_SCHEMA (streaming sinks commit
        # empty micro-batch slices routinely — e.g. a dedup batch with no
        # candidates).
        os.makedirs(self.data_path, exist_ok=True)
        # Read back ONLY this snapshot's subtree (basePath keeps the
        # partition columns): listing-level pruning, and whole-root
        # discovery would break once partition specs have evolved.
        snap_dir = os.path.join(self.data_path, f"{SNAPSHOT_COL}={snapshot_id}")
        if os.path.isdir(snap_dir):
            written = (
                spark.read.schema(out.schema)
                .option("basePath", self.data_path)
                .parquet(snap_dir)
            )
        else:  # zero-row snapshot: no files, no directory
            written = spark.createDataFrame([], out.schema)
        group = [SNAPSHOT_COL, *partition_cols] if partition_cols else [SNAPSHOT_COL]
        stats = written.groupBy(*group).agg(F.count(F.lit(1)).alias("row_count"))
        stats = stats.withColumn("write_latency_sec", F.lit(float(latency)))
        committed_at = float(time.time())
        stats = stats.withColumn("committed_at_unix", F.lit(committed_at))
        # Materialize the (tiny: one row per partition of one snapshot)
        # lineage ONCE — the manifest append below would otherwise
        # re-execute the read-back scan + aggregation as a second job on
        # every commit. A zero-row snapshot still needs its manifest row
        # — the manifest IS the commit record; without it the snapshot
        # never becomes a replay no-op and committed_snapshots/read()
        # never see it.
        rows = stats.collect()
        if not rows:
            rows = [(snapshot_id, *([None] * len(partition_cols)), 0,
                     float(latency), committed_at)]
        stats = spark.createDataFrame(rows, schema=stats.schema)
        # schema-as-of-snapshot (Iceberg keeps schema in table metadata,
        # never by merging data-file footers): one row per commit with the
        # dataframe's schema JSON. read()/read_at() resolve the schema
        # from here in O(1) instead of option("mergeSchema") footer sweeps
        # — and time travel reads the OLD schema, matching VERSION AS OF.
        # Written BEFORE the manifest row: the manifest append is the
        # commit point (Iceberg commits schema atomically with the
        # snapshot), so ordering schema-first guarantees every committed
        # snapshot has a schema entry. A crash after the schema row but
        # before the manifest row leaves only an orphan schema row for an
        # uncommitted (invisible) snapshot; the retry re-appends an
        # identical-schema row, so readers are unaffected either way.
        spark.createDataFrame(
            [(snapshot_id, committed_at, out.schema.json())],
            schema=f"{SNAPSHOT_COL} string, committed_at_unix double, schema_json string",
        ).coalesce(1).write.mode("append").parquet(self.schema_path)
        (
            stats.coalesce(1)
            .write.mode("append")
            .parquet(self.manifest_path)
        )
        # O(1) current-schema pointer: the streaming sink commits once per
        # micro-batch, so the append log grows unboundedly; read() must
        # not scan it all per call. Written last, so it always describes a
        # manifested commit; staleness after a crash mid-commit only means
        # the PREVIOUS schema is served, which is correct (the crashed
        # snapshot is invisible until its manifest row lands on retry).
        tmp = os.path.join(self.root, "_schema_latest.json.tmp")
        with open(tmp, "w") as f:
            f.write(out.schema.json())
        os.replace(tmp, os.path.join(self.root, "_schema_latest.json"))
        return True

    def _table_partition_cols(self) -> list[str] | None:
        """The table's inner partition columns, from the directory
        structure of any existing snapshot; None when no data exists yet
        (the first commit fixes the spec)."""
        if not os.path.isdir(self.data_path):
            return None
        for entry in sorted(os.listdir(self.data_path)):
            if not entry.startswith(f"{SNAPSHOT_COL}="):
                continue
            cols: list[str] = []
            d = os.path.join(self.data_path, entry)
            while True:
                subdirs = [e for e in os.listdir(d)
                           if "=" in e and os.path.isdir(os.path.join(d, e))]
                if not subdirs:
                    return cols
                cols.append(subdirs[0].split("=", 1)[0])
                d = os.path.join(d, subdirs[0])
        return None

    def _schema_asof(self, spark: SparkSession, cutoff: tuple | None = None):
        """Latest recorded schema (or latest at/before ``cutoff`` =
        (committed_at, snapshot_id)); None when no schema log exists
        (tables written before schema tracking — fall back to footer
        inference). The no-cutoff path reads the O(1) latest-pointer file;
        only time travel scans the append log."""
        import json as _json

        from pyspark.sql import types as T

        if cutoff is None:
            latest = os.path.join(self.root, "_schema_latest.json")
            if os.path.exists(latest):
                with open(latest) as f:
                    return T.StructType.fromJson(_json.loads(f.read()))
        try:
            log = spark.read.parquet(self.schema_path).collect()
        except Exception:
            return None
        rows = sorted((r["committed_at_unix"], r[SNAPSHOT_COL], r["schema_json"])
                      for r in log)
        if cutoff is not None:
            rows = [r for r in rows if (r[0], r[1]) <= cutoff]
        if not rows:
            return None
        return T.StructType.fromJson(__import__("json").loads(rows[-1][2]))

    def _restore_trashed_snapshots(self) -> None:
        """Crash healing on the read path: a compact() that died between
        its two swap renames leaves ``_trash/<id>`` holding the ONLY copy
        of a committed snapshot while the manifest still lists it — serving
        the table then silently drops that snapshot's rows. Restore any
        such directory before reading (restore-only: completed-swap trash
        is left for maintenance.sweep_trash to reclaim)."""
        trash_root = os.path.join(self.root, "_trash")
        if not os.path.isdir(trash_root):
            return
        for sid in os.listdir(trash_root):
            snap_dir = os.path.join(self.data_path, f"{SNAPSHOT_COL}={sid}")
            if not os.path.exists(snap_dir):
                os.rename(os.path.join(trash_root, sid), snap_dir)

    def _snapshot_partition_cols(self, snapshot_id: str) -> tuple[str, ...]:
        """One snapshot's partition spec, from its directory subtree —
        the per-snapshot source of truth partition evolution needs (and
        backward-compatible: tables written before evolution existed
        derive the same answer from their layout)."""
        d = os.path.join(self.data_path, f"{SNAPSHOT_COL}={snapshot_id}")
        cols: list[str] = []
        while os.path.isdir(d):
            subdirs = [e for e in os.listdir(d)
                       if "=" in e and os.path.isdir(os.path.join(d, e))]
            if not subdirs:
                break
            cols.append(subdirs[0].split("=", 1)[0])
            d = os.path.join(d, subdirs[0])
        return tuple(cols)

    def _read_snapshots(self, spark: SparkSession, ids, schema) -> DataFrame:
        """Scan exactly the given committed snapshots, grouping them by
        partition spec: each group is one listing-pruned multi-directory
        scan (partition pruning intact within the group); groups with
        different specs union by name. With one spec — every table that
        never evolved — this is a single scan, the pre-evolution plan."""
        # zero-row snapshots committed no files and have no directory —
        # they are manifest-only and contribute nothing to a scan
        ids = sorted(
            s for s in ids
            if os.path.isdir(os.path.join(self.data_path, f"{SNAPSHOT_COL}={s}"))
        )
        if not ids:
            if schema is not None:
                return spark.createDataFrame([], schema)
            return spark.read.parquet(self.data_path).filter(F.lit(False))
        groups: dict[tuple[str, ...], list[str]] = {}
        for sid in ids:
            groups.setdefault(self._snapshot_partition_cols(sid), []).append(sid)
        frames = []
        for _spec, sids in sorted(groups.items()):
            reader = (
                spark.read.schema(schema) if schema is not None else spark.read
            )
            frames.append(
                reader.option("basePath", self.data_path).parquet(
                    *[
                        os.path.join(self.data_path, f"{SNAPSHOT_COL}={s}")
                        for s in sids
                    ]
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def read(self, spark: SparkSession) -> DataFrame:
        """Read only manifested snapshots (half-written data is invisible —
        snapshot isolation for readers). Schema comes from the schema log
        (latest commit wins): columns added by later snapshots null-fill
        older files, with no mergeSchema footer sweep. Snapshots written
        under DIFFERENT partition specs (partition evolution) are scanned
        per spec group and unioned by name."""
        self._restore_trashed_snapshots()
        schema = self._schema_asof(spark)
        committed = self.committed_snapshots(spark)
        return self._read_snapshots(spark, committed, schema)

    def snapshots(self, spark: SparkSession) -> DataFrame | None:
        """Snapshot log: (snapshot_id, committed_at_unix, n_rows) — the
        Iceberg snapshots-metadata-table analog."""
        mf = self.manifest(spark)
        if mf is None:
            return None
        return mf.groupBy(SNAPSHOT_COL).agg(
            F.min("committed_at_unix").alias("committed_at_unix"),
            F.sum("row_count").alias("n_rows"),
        )

    def read_at(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Time travel: the table as of ``snapshot_id`` — every snapshot
        committed at or before it (Iceberg ``VERSION AS OF`` analog).
        Visibility is a strict prefix of the (committed_at, snapshot_id)
        total order — the id tie-break keeps two snapshots that land on the
        same commit timestamp from observing each other ("future" data).
        Raises KeyError for an unknown/uncommitted snapshot id."""
        self._restore_trashed_snapshots()
        snaps = self.snapshots(spark)
        if snaps is None:
            raise KeyError(snapshot_id)
        rows = {r[0]: r[1] for r in snaps.select(SNAPSHOT_COL, "committed_at_unix").collect()}
        if snapshot_id not in rows:
            raise KeyError(snapshot_id)
        cutoff = (rows[snapshot_id], snapshot_id)
        visible = [s for s, t in rows.items() if (t, s) <= cutoff]
        # time travel reads the schema AS OF that snapshot: a column added
        # later does not exist in the past (Iceberg VERSION AS OF)
        schema = self._schema_asof(spark, cutoff=cutoff)
        return self._read_snapshots(spark, visible, schema)


def plan_increment(
    available_inputs: Sequence[str], writer: SnapshotWriter, spark: SparkSession
) -> list[str]:
    """Resume planner: inputs (snapshot ids / file batches) not yet in the
    manifest, in stable order."""
    done = writer.committed_snapshots(spark)
    return [s for s in available_inputs if s not in done]


def new_snapshot_id() -> str:
    return uuid.uuid4().hex[:16]
