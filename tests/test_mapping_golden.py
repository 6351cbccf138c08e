"""Golden-vector tests (SURVEY.md §5.1-5.2): the three mapping-doc sample
events through the Spark pipeline, asserted field-for-field against the
documented OCSF outputs. The reference ships no tests; its mapping docs
are the de-facto golden specs:
  * mapping_docs/windows-sysmon-mapping.md:46-82
  * mapping_docs/application-load-balancer-mapping.md:11-56
  * mapping_docs/aws-network-firewall-mapping.md:11-68
Mapping configs are loaded from the read-only reference tree (they are
user-supplied runtime config for this engine, not code).
"""

import json
import os

import pytest
from pyspark.sql import types as T

from amazon_security_lake_transformation_library_spark.functions.mapping_compiler import (
    MappingCompiler,
    strptime_to_spark,
)
from amazon_security_lake_transformation_library_spark.sources.alb import parse_alb_lines
from amazon_security_lake_transformation_library_spark.sources.nfw import parse_nfw_lines
from amazon_security_lake_transformation_library_spark.sources.sysmon import preprocess_sysmon

MAPPINGS_DIR = "/root/reference/transformation_function/mappings"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MAPPINGS_DIR), reason="reference mapping configs unavailable"
)


def _load(name):
    with open(f"{MAPPINGS_DIR}/{name}") as f:
        return json.load(f)


SYSMON_DESC = "\r\n".join(
    [
        "File created:",
        "RuleName: technique_id=T1574.010,technique_name=Services File Permissions Weakness",
        "UtcTime: 2023-10-03 23:50:22.438",
        "ProcessGuid: {78c8aea6-5a34-651b-1900-000000005f01}",
        "ProcessId: 1128",
        "Image: C:\\Windows\\System32\\svchost.exe",
        "TargetFilename: C:\\Windows\\ServiceState\\EventLog\\Data\\lastalive1.dat",
        "CreationUtcTime: 2023-10-03 00:04:00.984",
        "User: NT AUTHORITY\\LOCAL SERVICE",
    ]
)

SYSMON_SCHEMA = T.StructType(
    [
        T.StructField("EventId", T.StringType()),
        T.StructField("source_instance_id", T.StringType()),
        T.StructField("Description", T.StringType()),
    ]
)


def test_strptime_conversion():
    assert strptime_to_spark("%Y-%m-%d %H:%M:%S.%f") == "yyyy-MM-dd HH:mm:ss.SSSSSS"
    assert (
        strptime_to_spark("%Y-%m-%dT%H:%M:%S.%fZ")
        == "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    )


def test_sysmon_process_activity_golden(spark):
    rows = [
        ("1", "i-1234example56789", SYSMON_DESC),
        ("22", "i-1234example56789", SYSMON_DESC),  # unmapped EventId
    ]
    df = preprocess_sysmon(spark.createDataFrame(rows, SYSMON_SCHEMA))
    res = MappingCompiler(_load("windows_sysmon.json")).transform(df)

    mapped = res.mapped.collect()
    assert len(mapped) == 1
    r = mapped[0].asDict(recursive=True)
    assert r["source"] == "windows-sysmon"
    assert r["target_schema"] == "process_activity"
    assert r["eventday"] == "20231003"
    # golden attributes (mapping_docs/windows-sysmon-mapping.md:62-82 +
    # mappings/windows_sysmon.json:13-60)
    assert r["metadata"]["product"]["name"] == "System Monitor (Sysmon)"
    assert r["metadata"]["product"]["vendor_name"] == "Microsoft Sysinternals"
    assert r["severity"] == "Informational" and r["severity_id"] == 1
    assert r["category_uid"] == 1 and r["class_uid"] == 1007
    assert r["activity_id"] == 1  # enum "1" -> 1
    assert r["time"] == "2023-10-03 23:50:22.438"
    assert r["device"]["instance_uid"] == "i-1234example56789"  # $.UserDefined.*
    assert r["process"]["pid"] == "1128"
    assert r["process"]["uid"] == "{78c8aea6-5a34-651b-1900-000000005f01}"
    assert r["actor"]["process"] == "C:\\Windows\\System32\\svchost.exe"
    # missing input field -> null, processing continues (app.py:131-136)
    assert r["process"]["loaded_modules"] is None

    rejects = res.rejects.collect()
    assert len(rejects) == 1
    assert rejects[0]["reject_reason"] == "no_mapping_for_value"


ALB_LINE = (
    "https 2018-07-02T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 "
    "192.168.131.39:2817 10.0.0.1:80 0.086 0.048 0.037 200 200 0 57 "
    '"GET https://www.example.com:443/ HTTP/1.1" "curl/7.46.0" '
    "ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 "
    "arn:aws:elasticloadbalancing:us-east-2:XXXXXXXXXXXX:targetgroup/my-targets/73e2d6bc24d8a067 "
    '"Root=1-58337281-1d84f3d73c47ec4e58577259" "www.example.com" '
    '"arn:aws:acm:us-east-2:XXXXXXXXXXXX:certificate/XXXXXXXX-1234-1234-1234-XXXXXXXXXXXX" 1 '
    '2018-07-02T22:22:48.364000Z "authenticate,forward" "-" "-" "10.0.0.1:80" "200" "-" "-" '
    "TID_123456"
)


def test_alb_tokenizer_golden(spark):
    df = spark.createDataFrame([(ALB_LINE,)], "value string")
    p = parse_alb_lines(df).collect()[0].asDict()
    assert p["type"] == "https"
    assert p["time"] == "2018-07-02T22:23:00.186641Z"
    assert p["elb"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert p["client_ip"] == "192.168.131.39" and p["client_port"] == "2817"
    assert p["target_ip"] == "10.0.0.1" and p["target_port"] == "80"
    assert p["request_method"] == "GET"
    assert p["request_url"] == "https://www.example.com:443/"
    assert p["request_protocol"] == "HTTP/1.1"
    assert p["request"] is None  # dropped when split succeeded
    assert p["user_agent"] == "curl/7.46.0"
    assert p["ssl_cipher"] == "ECDHE-RSA-AES128-GCM-SHA256"
    assert p["domain_name"] == "www.example.com"
    assert p["target_ip_list"] == "10.0.0.1" and p["target_port_list"] == "80"
    assert p["redirect_url"] == "-" and p["error_reason"] == "-"
    assert p["conn_trace_id"] == "TID_123456"


def test_alb_tokenizer_short_and_malformed(spark):
    rows = [
        ("http 2018-07-02T22:23:00.186641Z my-elb 1.2.3.4:55 -",),
        ('http 2018-07-02T22:23:00.186641Z my-elb - - 0.1 0.1 0.1 200 200 0 0 "BROKEN" "ua"',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_alb_lines(df).collect()
    short = out[0].asDict()
    assert short["target_ip"] == "-" and short["target_port"] == "-"
    assert short["sent_bytes"] == "-"  # past end of line -> '-'
    assert short["conn_trace_id"] == "-"
    broken = out[1].asDict()
    assert broken["request"] == "BROKEN"  # malformed triple kept raw
    assert broken["request_method"] is None
    assert broken["client_ip"] == "-" and broken["client_port"] == "-"


def test_alb_https_mapping_golden(spark):
    df = parse_alb_lines(spark.createDataFrame([(ALB_LINE,)], "value string"))
    res = MappingCompiler(_load("aws_alb.json")).transform(df)
    rows = res.mapped.collect()
    assert len(rows) == 1
    r = rows[0].asDict(recursive=True)
    assert r["target_schema"] == "http_activity"
    assert r["eventday"] == "20180702"
    assert r["app_name"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert r["activity_id"] == 3 and r["activity_name"] == "GET"
    assert r["class_uid"] == 4002 and r["category_uid"] == 4
    assert r["http_request"]["http_method"] == "GET"
    assert r["http_request"]["url"]["hostname"] == "www.example.com"
    assert r["http_request"]["url"]["scheme"] == "https"
    assert r["http_response"]["code"] == "200"
    assert r["src_endpoint"]["ip"] == "192.168.131.39"
    assert r["src_endpoint"]["port"] == "2817"
    assert r["dst_endpoint"]["ip"] == "10.0.0.1"
    assert r["connection_info"]["protocol_num"] == 6
    assert r["traffic"]["bytes_in"] == "0" and r["traffic"]["bytes_out"] == "57"
    assert r["tls"]["version"] == "TLSv1.2"
    assert r["unmapped"]["target_status_code"] == "200"
    assert r["unmapped"]["conn_trace_id"] == "TID_123456"


NFW_EVENT = {
    "firewall_name": "firewall",
    "availability_zone": "us-east-1b",
    "event_timestamp": "1601587565",
    "event": {
        "timestamp": "2020-10-01T21:26:05.007515+0000",
        "flow_id": 1770453319291727,
        "event_type": "netflow",
        "src_ip": "45.129.33.153",
        "src_port": 47047,
        "dest_ip": "172.31.16.139",
        "dest_port": 16463,
        "proto": "TCP",
        "netflow": {
            "pkts": 1,
            "bytes": 60,
            "start": "2020-10-01T21:25:04.070479+0000",
            "end": "2020-10-01T21:25:04.070479+0000",
            "age": 0,
            "min_ttl": 241,
            "max_ttl": 241,
        },
        "tcp": {"tcp_flags": "02", "syn": True},
    },
}


def test_nfw_netflow_golden(spark):
    lines = [(json.dumps(NFW_EVENT),), ("this is not json at all {",)]
    df = parse_nfw_lines(spark.createDataFrame(lines, "value string"))
    # raw fallback: unparseable line keeps its bytes (app.py:304-308)
    raws = df.filter("rawData is not null").collect()
    assert len(raws) == 1 and raws[0]["rawData"].startswith("this is not")

    res = MappingCompiler(_load("aws_nfw.json")).transform(
        df.filter("rawData is null")
    )
    rows = res.mapped.collect()
    assert len(rows) == 1
    r = rows[0].asDict(recursive=True)
    assert r["target_schema"] == "network_activity"
    # epoch 1601587565 = 2020-10-01T21:26:05Z -> UTC eventday (reference
    # parses in host-local TZ, app.py:75 — deliberate fix, SURVEY §2.A#3)
    assert r["eventday"] == "20201001"
    assert r["src_endpoint"]["ip"] == "45.129.33.153"
    assert r["src_endpoint"]["port"] == "47047"  # int -> str coercion (app.py:106)
    assert r["dst_endpoint"]["port"] == "16463"
    assert r["connection_info"]["protocol_name"] == "TCP"
    assert r["traffic"]["bytes"] == "60"


def test_type_uid_fix_mode(spark):
    """fix_type_uid recomputes class_uid*100+activity_id (app.py:68-70 is
    dead code; windows_sysmon.json:28 hardcodes 100701 for all process
    events — SURVEY §2.A bug #4)."""
    rows = [("5", "i-x", "UtcTime: 2023-10-03 23:50:22.438\r\nImage: x.exe")]
    df = preprocess_sysmon(spark.createDataFrame(rows, SYSMON_SCHEMA))
    stock = MappingCompiler(_load("windows_sysmon.json")).transform(df)
    fixed = MappingCompiler(_load("windows_sysmon.json"), fix_type_uid=True).transform(df)
    assert stock.mapped.collect()[0]["type_uid"] == 100701  # hardcoded
    assert fixed.mapped.collect()[0]["type_uid"] == 100702  # 1007*100 + 2


def test_alb_fast_tokenizer_equals_strict(spark):
    """The default quote-split tokenizer must match the reference-regex
    strict path on well-formed, short, malformed, empty-quoted, and
    unbalanced-quote lines (the documented divergences need an embedded
    unspaced quote run or a tab, which the ALB format never emits)."""
    rows = [
        (ALB_LINE,),
        ("http 2018-07-02T22:23:00.186641Z my-elb 1.2.3.4:55 -",),
        ('http x y - - 0.1 0.1 0.1 200 200 0 0 "BROKEN" "ua"',),
        ('a "" b "c d" e"',),
        ('"x y" "" tail',),
        ("",),
        ("   ",),
        ('"unterminated c d',),
        ('x "a" "b',),
        ('trail" q',),
        ("a  double  spaces   z",),
    ]
    df = spark.createDataFrame(rows, "value string")
    fast = parse_alb_lines(df)
    strict = parse_alb_lines(df, strict_tokens=True)
    assert fast.exceptAll(strict).count() == 0
    assert strict.exceptAll(fast).count() == 0
