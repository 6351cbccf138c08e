"""Ingest I/O surface (A1-A6) unit tests: routing order, JSON fallback
passthrough, base64 round-trip — the driver's differential gate covers the
cross-engine equivalence; these pin the library semantics directly.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazon_security_lake_transformation_library_spark.sources.lines import (
    decode_kinesis,
    parse_json_lines,
)
from amazon_security_lake_transformation_library_spark.sources.registry import SourceRegistry

CFG = {
    "sources": [
        {
            "name": "first",
            "input_paths": {
                "s3": {
                    "enabled": True,
                    "source_buckets": [{"bucket_name": "b", "prefix": "x/*"}],
                }
            },
        },
        {
            "name": "second",
            "input_paths": {
                "s3": {
                    "enabled": True,
                    # overlapping prefix: first-listed source must win,
                    # matching detect_s3_key's iteration order
                    "source_buckets": [{"bucket_name": "b", "prefix": "x/y/*"}],
                }
            },
        },
    ]
}


def test_s3_source_col_matches_detect_s3_key(spark):
    reg = SourceRegistry.from_config(CFG, mappings={})
    keys = [("x/y/z.gz",), ("x/q.gz",), ("other/k.gz",)]
    df = spark.createDataFrame(keys, "key string")
    got = {
        r["key"]: r["src"]
        for r in df.select(
            "key", reg.s3_source_col(F.lit("b"), F.col("key")).alias("src")
        ).collect()
    }
    for (k,) in keys:
        assert got[k] == reg.detect_s3_key("b", k)
    assert got["x/y/z.gz"] == "first"  # overlap: config order wins
    assert got["other/k.gz"] is None  # unrouted -> NULL (detect: None)
    # wrong bucket never routes
    assert (
        df.select(reg.s3_source_col(F.lit("nope"), F.col("key")).alias("s"))
        .filter(F.col("s").isNotNull())
        .count()
        == 0
    )


def test_parse_json_lines_keep_cols_and_fallback(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 7, "b": "ok"}'), (2, "not json")], "id int, value string"
    )
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    out = parse_json_lines(df, schema, keep_cols=("id",))
    assert out.columns == ["id", "a", "b", "rawData"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["a"] == 7 and rows[1]["b"] == "ok" and rows[1]["rawData"] is None
    assert rows[2]["a"] is None and rows[2]["rawData"] == "not json"


def test_kinesis_decode_unicode_roundtrip(spark):
    df = spark.createDataFrame([("héllo wörld ☃",)], "s string")
    enc = df.select("s", F.base64(F.encode("s", "UTF-8")).alias("data"))
    out = decode_kinesis(enc).select("s", "payload").collect()[0]
    assert out["payload"] == out["s"]
