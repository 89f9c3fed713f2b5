from __future__ import annotations

import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
