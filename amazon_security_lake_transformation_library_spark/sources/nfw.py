"""AWS Network Firewall JSON events: typed schema + parse.

Reference: the aws-nfw source has no preprocessor (sources_config.json:29-43)
— raw JSON lines parse straight into the mapping (app.py:306). Schema from
mapping_docs/aws-network-firewall-mapping.md:11-40 (FIXTURES.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .lines import parse_json_lines

NFW_SCHEMA = T.StructType(
    [
        T.StructField("firewall_name", T.StringType()),
        T.StructField("availability_zone", T.StringType()),
        T.StructField("event_timestamp", T.StringType()),
        T.StructField(
            "event",
            T.StructType(
                [
                    T.StructField("timestamp", T.StringType()),
                    T.StructField("flow_id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("src_ip", T.StringType()),
                    T.StructField("src_port", T.IntegerType()),
                    T.StructField("dest_ip", T.StringType()),
                    T.StructField("dest_port", T.IntegerType()),
                    T.StructField("proto", T.StringType()),
                    T.StructField(
                        "netflow",
                        T.StructType(
                            [
                                T.StructField("pkts", T.IntegerType()),
                                T.StructField("bytes", T.LongType()),
                                T.StructField("start", T.StringType()),
                                T.StructField("end", T.StringType()),
                                T.StructField("age", T.IntegerType()),
                                T.StructField("min_ttl", T.IntegerType()),
                                T.StructField("max_ttl", T.IntegerType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "tcp",
                        T.StructType(
                            [
                                T.StructField("tcp_flags", T.StringType()),
                                T.StructField("syn", T.BooleanType()),
                                T.StructField("fin", T.BooleanType()),
                                T.StructField("ack", T.BooleanType()),
                                T.StructField("psh", T.BooleanType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "alert",
                        T.StructType(
                            [
                                T.StructField("action", T.StringType()),
                                T.StructField("signature_id", T.IntegerType()),
                                T.StructField("rev", T.IntegerType()),
                                T.StructField("signature", T.StringType()),
                                T.StructField("category", T.StringType()),
                                T.StructField("tls_inspected", T.BooleanType()),
                                T.StructField("severity", T.IntegerType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "tls",
                        T.StructType(
                            [
                                T.StructField("version", T.StringType()),
                                T.StructField("sni", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def parse_nfw_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    return parse_json_lines(df, NFW_SCHEMA, line_col)
