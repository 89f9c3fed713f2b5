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


def zorder_value(col_a, col_b, *, bits: int = 21):
    """Interleave the low ``bits`` of two non-negative int columns into
    a Z-curve (Morton) value — statically-unrolled shifts, all codegen.

    Sorting/range-partitioning by this value before writing parquet
    clusters BOTH dimensions into the same row groups, so min/max
    stats prune scans for predicates on either column — the data-
    skipping layout trick for multi-dim filters (42 bits total fits a
    bigint with headroom).
    """
    from pyspark.sql import functions as F

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned + sorted by the Z-value of
    (col_a, col_b): row-group min/max stats become selective for
    filters on either column."""
    from pyspark.sql import functions as F

    z = zorder_value(col_a, col_b).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two identically-bucketed tables; Catalyst elides both
    shuffle exchanges (verify: no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
