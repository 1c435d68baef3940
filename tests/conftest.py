from __future__ import annotations

import pytest

from efficient_query_expansion_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="eqx-tests", cores=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def transcripts_tiny(spark):
    from efficient_query_expansion_spark.fixtures import spark_transcripts

    df = spark_transcripts(spark, n_convs=50).cache()
    df.count()
    return df
