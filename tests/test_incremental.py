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
