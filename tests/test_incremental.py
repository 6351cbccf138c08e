"""Incremental view maintenance (merge.incremental_refresh): the
refreshed snapshot must equal a full rebuild for any temporal cutoff,
and an empty delta must return the base snapshot unchanged.
"""

import pandas as pd
import pytest

from amazon_security_lake_transformation_library_spark.operators.chatprep import (
    conv_profile,
)
from amazon_security_lake_transformation_library_spark.operators.merge import (
    incremental_refresh,
)
from tests.conftest import spark_to_pandas_sorted


def _refresh_at(spark, transcripts_df, cutoff_ts):
    from pyspark.sql import functions as F

    cutoff = F.lit(cutoff_ts).cast(transcripts_df.schema["ts"].dataType)
    base = conv_profile(transcripts_df.filter(F.col("ts") < cutoff))
    return incremental_refresh(
        base,
        transcripts_df,
        transcripts_df.filter(F.col("ts") >= cutoff),
        conv_profile,
        keys="conv_id",
    )


@pytest.mark.parametrize(
    "cutoff", ["2024-01-05 00:00:00", "2024-01-16 12:00:00", "2024-01-29 06:00:00"]
)
def test_incremental_equals_full_rebuild(spark, transcripts_df, cutoff):
    got = spark_to_pandas_sorted(_refresh_at(spark, transcripts_df, cutoff), ["conv_id"])
    want = spark_to_pandas_sorted(conv_profile(transcripts_df), ["conv_id"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_incremental_empty_delta_is_identity(spark, transcripts_df):
    from pyspark.sql import functions as F

    base = conv_profile(transcripts_df)
    out = incremental_refresh(
        base,
        transcripts_df,
        transcripts_df.filter(F.lit(False)),
        conv_profile,
        keys="conv_id",
    )
    got = spark_to_pandas_sorted(out, ["conv_id"])
    want = spark_to_pandas_sorted(base, ["conv_id"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_incremental_cutoff_before_everything_recomputes_all(spark, transcripts_df):
    """Degenerate split: empty base + full delta must still equal the
    full rebuild (every conversation is 'affected')."""
    got = spark_to_pandas_sorted(
        _refresh_at(spark, transcripts_df, "2000-01-01 00:00:00"), ["conv_id"]
    )
    want = spark_to_pandas_sorted(conv_profile(transcripts_df), ["conv_id"])
    pd.testing.assert_frame_equal(got, want, check_like=True)


# ------------------------------------------------------ SCD2 + snapshot diff

def test_scd2_collapse_and_intervals(spark):
    import datetime as dt
    import pandas as pd
    from pyspark.sql import functions as F
    from amazon_security_lake_transformation_library_spark.operators import merge as mg

    t0 = dt.datetime(2024, 1, 1)
    log = spark.createDataFrame(pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 2,
        "ts": [t0 + dt.timedelta(hours=h) for h in [0, 1, 2, 3, 4, 0, 0]],
        "seq": [1, 2, 3, 4, 5, 1, 2],
        "state": ["x", "x", "y", "y", "x", "p", "q"],  # a: x..->y->..->x
    }))
    out = mg.scd2_build(log, ["k"], "ts", ["state"], tiebreak="seq")
    rows = sorted(
        [(r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out.collect()]
    )
    # a collapses to three versions: x@0h->2h, y@2h->4h, x@4h->open
    a = [r for r in rows if r[0] == "a"]
    assert [(r[1], r[2].hour) for r in a] == [("x", 0), ("x", 4), ("y", 2)]
    assert sum(1 for r in a if r[4]) == 1
    opened = [r for r in a if r[4]][0]
    assert opened[1] == "x" and opened[2].hour == 4 and opened[3] is None
    # chained: each valid_to equals the next version's valid_from
    seq = sorted(a, key=lambda r: r[2])
    assert seq[0][3] == seq[1][2] and seq[1][3] == seq[2][2]
    # b: equal-ts writes resolve by seq -> p then q; q is current
    b = sorted([r for r in rows if r[0] == "b"], key=lambda r: r[4])
    assert [r[1] for r in b] == ["p", "q"] and b[1][4] is True


def test_snapshot_diff_change_types_and_silence(spark):
    import pandas as pd
    from amazon_security_lake_transformation_library_spark.operators import merge as mg

    old = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    new = spark.createDataFrame(pd.DataFrame(
        {"k": [2, 3, 4, 5], "v": ["b", "C", "d", "e"]}))
    out = {r["k"]: r for r in mg.snapshot_diff(old, new, ["k"]).collect()}
    assert out[1]["change_type"] == "delete" and out[1]["new_v"] is None
    assert 2 not in out  # unchanged -> NOT emitted
    assert out[3]["change_type"] == "update"
    assert (out[3]["old_v"], out[3]["new_v"]) == ("c", "C")
    assert out[5]["change_type"] == "insert" and out[5]["old_v"] is None


def test_snapshot_diff_null_safe(spark):
    from pyspark.sql import functions as F
    from amazon_security_lake_transformation_library_spark.operators import merge as mg

    old = spark.createDataFrame([(1, "a"), (2, None)], "k int, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    out = {r["k"]: r["change_type"]
           for r in mg.snapshot_diff(old, new, ["k"]).collect()}
    assert out.get(1) == "update"   # a -> NULL is a change
    assert 2 not in out             # NULL == NULL is NOT a change
