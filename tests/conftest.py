import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_security_lake_transformation_library_spark.session import get_spark
from amazon_security_lake_transformation_library_spark.synth.transcripts import (
    gen_conv_features,
    gen_transcripts,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("asl-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return gen_transcripts(n_convs=60, mean_turns=15, seed=42)


@pytest.fixture(scope="session")
def conv_features_pdf(transcripts_pdf) -> pd.DataFrame:
    return gen_conv_features(transcripts_pdf)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf)
    return df.withColumn("turn_idx", df.turn_idx.cast("int")).cache()


@pytest.fixture(scope="session")
def conv_features_df(spark, conv_features_pdf):
    return spark.createDataFrame(conv_features_pdf).cache()


def spark_to_pandas_sorted(df, keys):
    pdf = df.toPandas()
    return pdf.sort_values(keys, kind="mergesort").reset_index(drop=True)
