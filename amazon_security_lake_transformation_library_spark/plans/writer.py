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
    ) -> bool:
        """Write one snapshot. Returns False (no-op) if already committed.

        ``bucket_col``/``n_buckets``: repartition so each output file holds
        a contiguous hash-bucket of entities; with ``sort_cols`` this gives
        the conv_id-bucketed, (ts, turn_idx)-sorted layout the as-of join's
        merge phase wants, and single-writer-per-partition determinism for
        the text byte-equality invariant (SURVEY.md §7.4 risk 4).
        """
        spark = df.sparkSession
        if snapshot_id in self.committed_snapshots(spark):
            return False

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

        # per-partition lineage from the files just written (pruned scan)
        written = spark.read.parquet(self.data_path).filter(
            F.col(SNAPSHOT_COL) == snapshot_id
        )
        group = [SNAPSHOT_COL, *partition_cols] if partition_cols else [SNAPSHOT_COL]
        stats = written.groupBy(*group).agg(F.count(F.lit(1)).alias("row_count"))
        stats = stats.withColumn("write_latency_sec", F.lit(float(latency)))
        committed_at = float(time.time())
        stats = stats.withColumn("committed_at_unix", F.lit(committed_at))
        (
            stats.coalesce(1)
            .write.mode("append")
            .parquet(self.manifest_path)
        )
        # schema-as-of-snapshot (Iceberg keeps schema in table metadata,
        # never by merging data-file footers): one row per commit with the
        # dataframe's schema JSON. read()/read_at() resolve the schema
        # from here in O(1) instead of option("mergeSchema") footer sweeps
        # — and time travel reads the OLD schema, matching VERSION AS OF.
        spark.createDataFrame(
            [(snapshot_id, committed_at, out.schema.json())],
            schema=f"{SNAPSHOT_COL} string, committed_at_unix double, schema_json string",
        ).coalesce(1).write.mode("append").parquet(self.schema_path)
        return True

    def _schema_asof(self, spark: SparkSession, cutoff: tuple | None = None):
        """Latest recorded schema (or latest at/before ``cutoff`` =
        (committed_at, snapshot_id)); None when no schema log exists
        (tables written before schema tracking — fall back to footer
        inference)."""
        from pyspark.sql import types as T

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

    def read(self, spark: SparkSession) -> DataFrame:
        """Read only manifested snapshots (half-written data is invisible —
        snapshot isolation for readers). Schema comes from the schema log
        (latest commit wins): columns added by later snapshots null-fill
        older files, with no mergeSchema footer sweep."""
        schema = self._schema_asof(spark)
        reader = spark.read.schema(schema) if schema is not None else spark.read
        df = reader.parquet(self.data_path)
        committed = self.committed_snapshots(spark)
        if not committed:
            return df.filter(F.lit(False))
        return df.filter(F.col(SNAPSHOT_COL).isin(*[F.lit(s) for s in committed]))

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
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.parquet(self.data_path).filter(
            F.col(SNAPSHOT_COL).isin(*[F.lit(s) for s in visible])
        )


def plan_increment(
    available_inputs: Sequence[str], writer: SnapshotWriter, spark: SparkSession
) -> list[str]:
    """Resume planner: inputs (snapshot ids / file batches) not yet in the
    manifest, in stable order."""
    done = writer.committed_snapshots(spark)
    return [s for s in available_inputs if s not in done]


def new_snapshot_id() -> str:
    return uuid.uuid4().hex[:16]
