"""Every oracle-backed query must hash-match its DuckDB twin at
sf0.01 — the local twin of the driver's correctness gate."""

from __future__ import annotations

import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    ORACLE,
    QUERIES,
)

from .conftest import SF_DIR_CORRECTNESS
from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, name):
    result = compare(spark, QUERIES[name], ORACLE[name], SF_DIR_CORRECTNESS)
    assert result["count_match"], f"{name}: row count {result}"
    assert result["schema_match"], f"{name}: schema {result}"
    assert result.get("kind_policy_ok", True), (
        f"{name}: decimal final surface (kind policy) {result}"
    )
    assert result["value_match"], f"{name}: values {result}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR_CORRECTNESS)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
