"""The fused salted feature block must equal the unsalted one exactly,
for any order-respecting chunking — including chunk sizes small enough
that every conversation spans many chunks (maximal boundary traffic)."""

from __future__ import annotations

import pandas as pd
import pytest

from amazon_security_lake_transformation_library_spark.operators.features import (
    build_turn_features,
)
from amazon_security_lake_transformation_library_spark.operators.salted import (
    time_chunk,
    turn_chunk,
)
from amazon_security_lake_transformation_library_spark.operators.salted_features import (
    build_turn_features_salted,
)
from tests.conftest import spark_to_pandas_sorted

KEYS = ["conv_id", "turn_idx"]


def _cmp(a, b):
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=True
    )


@pytest.mark.parametrize(
    "chunk_factory",
    [
        pytest.param(lambda: turn_chunk(chunk_size=7), id="turn_chunk_7"),
        pytest.param(lambda: turn_chunk(chunk_size=64), id="turn_chunk_64"),
        pytest.param(lambda: time_chunk(chunk_seconds=3600), id="time_chunk_1h"),
    ],
)
def test_salted_equals_unsalted(transcripts_df, chunk_factory):
    plain = spark_to_pandas_sorted(build_turn_features(transcripts_df), KEYS)
    salted = spark_to_pandas_sorted(
        build_turn_features_salted(transcripts_df, chunk_factory()), KEYS
    )
    assert list(plain.columns) == list(salted.columns)
    _cmp(plain, salted)


def test_salted_single_chunk_degenerates(transcripts_df):
    # chunk size larger than any conversation -> identical single-partition
    # behavior (boundary logic must be a no-op, not a corruption)
    plain = spark_to_pandas_sorted(build_turn_features(transcripts_df), KEYS)
    salted = spark_to_pandas_sorted(
        build_turn_features_salted(transcripts_df, turn_chunk(chunk_size=1 << 30)),
        KEYS,
    )
    _cmp(plain, salted)
