"""Physical data layout operators: partitioned writes and bucketed
tables — the storage-side levers that matter most at 100 TB.

- ``write_partitioned``: hive-style partition directories; queries
  filtering on the partition key scan only matching directories
  (PartitionFilters in the plan, zero I/O elsewhere).
- ``write_bucketed``: pre-shuffles rows into a fixed number of buckets
  by join key. Two tables bucketed the same way join with NO exchange
  on either side — at 100 TB that removes the dominant cost of
  repeated fact⋈fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucketing metadata lives in
    the catalog, so this is saveAsTable, not a bare path write)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two identically-bucketed tables; Catalyst elides both
    shuffle exchanges (verify: no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
