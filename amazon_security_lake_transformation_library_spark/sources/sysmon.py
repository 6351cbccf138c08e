"""Windows Sysmon ``Description`` parser, vectorized.

Reference: transformation_function/preprocessors/sysmon_preprocessor.py:9-39
— splits the multi-line Description on CRLF, then each line on the FIRST
``': '`` into key/value; delimiter-less lines get ``Line{n}`` fallback keys
(:29-31; divergence: we key them ``_line_{i}`` by their physical position,
since the reference's counter depends on dict insert order).

Implemented with builtin array/map expressions (split / filter / transform /
map_from_entries): JVM-side, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def description_to_map(col: Column) -> Column:
    """string Description -> map<string,string> (first-': '-split per line)."""
    lines = F.filter(F.split(col, "\r\n"), lambda l: l != "")
    entries = F.transform(
        lines,
        lambda l, i: F.struct(
            F.when(
                l.rlike(": "), F.regexp_extract(l, r"^(.*?): ", 1)
            ).otherwise(F.concat(F.lit("_line_"), (i + 1).cast("string"))).alias("key"),
            F.when(
                l.rlike(": "), F.regexp_replace(l, r"^.*?: ", "")
            ).otherwise(l).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def preprocess_sysmon(df: DataFrame, desc_col: str = "Description") -> DataFrame:
    """Replace the raw Description string column with its parsed map —
    the dot locators ``$.Description.UtcTime`` etc. then resolve as map
    lookups in the mapping compiler."""
    return df.withColumn(desc_col, description_to_map(F.col(desc_col)))
