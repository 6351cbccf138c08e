"""Timestamp helpers that are safe for both TIMESTAMP and TIMESTAMP_NTZ.

Parquet written by plain pyarrow (no tz) reads back as TIMESTAMP_NTZ, and
Spark 4 forbids NTZ -> DOUBLE casts; casting through TIMESTAMP first is legal
for both and deterministic because every session pins
``spark.sql.session.timeZone=UTC`` (session.py) — unlike the reference,
which parses epochs in the host's local zone
(transformation_function/app.py:75).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since epoch (double, microsecond precision) for TIMESTAMP or
    TIMESTAMP_NTZ columns."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def eventday(col: Column | str) -> Column:
    """The reference's partition key derivation (app.py:73-81):
    timestamp -> 'YYYYMMDD' string, always UTC."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c.cast("timestamp"), "yyyyMMdd")
