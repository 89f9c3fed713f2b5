"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference EDA3 shape:
explode-split categories → filter → group-count → top-k,
Scalable_EDA_Final.py:178-189) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the LLM-pipeline uplift set; see
sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark/plans/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    ORACLE,
    QUERIES,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_part_type_tokens"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return dict(ORACLE)
