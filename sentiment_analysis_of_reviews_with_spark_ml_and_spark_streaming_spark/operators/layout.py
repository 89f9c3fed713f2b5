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

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F


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


def zorder_value_n(cols, *, bits: int | None = None):
    """N-way Morton value: round-robin interleave the low bits of N
    non-negative int columns (``bits`` per column, default ``63 // n``
    so the result fits a bigint). Statically-unrolled shifts — pure
    codegen, no UDF. Generalizes :func:`zorder_value`; with more than
    ~4 columns per-column resolution drops below what min/max file
    stats can exploit, the standard Z-order guidance."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    bits = bits if bits is not None else 63 // n
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols overflows a bigint")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
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


def upsert_into_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    *,
    key_cols: list[str],
    partition_col: str,
    version_col: str,
) -> None:
    """MERGE/upsert into a hive-partitioned parquet dataset without a
    table format: rewrite ONLY the partitions the update batch touches.

    Mechanics (the pattern Delta/Iceberg formalize with metadata):
    1. the touched partition values come from the (small) update batch;
    2. existing rows are read with a partition filter — directory
       pruning, so I/O is proportional to touched partitions, not the
       dataset;
    3. old ∪ new is deduped per key, keeping the row with the highest
       ``version_col`` (ties break to the update side);
    4. ``partitionOverwriteMode=dynamic`` overwrites only the touched
       directories atomically-per-partition; untouched partitions are
       never read or written.

    Not a lakehouse: no snapshot isolation or concurrent-writer safety
    — that is exactly what a table format adds on top (ROADMAP item 2).
    Scale: cost ∝ touched-partition bytes; the dedup shuffles only
    those partitions, hash-partitioned by key.
    """
    from pyspark.sql import Window, functions as F

    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # NULL-safe membership: isin([None, ...]) evaluates to NULL for the
    # stored null-partition rows, silently EXCLUDING them from
    # `existing` — dynamic overwrite would then rewrite
    # __HIVE_DEFAULT_PARTITION__ with only the update rows, deleting
    # every pre-existing null-partition row the batch didn't supersede.
    non_null = [t for t in touched if t is not None]
    member = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(t is None for t in touched):
        member = member | F.col(partition_col).isNull()
    existing = spark.read.parquet(path).filter(member)
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    *,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_date: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply an update batch to
    a versioned dimension, closing changed rows and opening new ones.

    ``current`` is the versioned dim (``key_cols`` + ``tracked_cols`` +
    ``start_col``/``end_col``/``current_col``); ``updates`` carries one
    row per key with the new ``tracked_cols`` values. Semantics:

    - live row, no update (or update equal on every tracked col,
      null-safely): passes through unchanged — no spurious versions;
    - live row, update differs: the live row is CLOSED
      (``end_col = effective_date``, ``current_col = false``) and a new
      open version is inserted with the update's values;
    - update for an unseen key: inserted as a brand-new open version;
    - historical (non-current) rows: pass through untouched.

    Scale: ONE full-outer join of the live slice against the update
    batch on ``key_cols`` — the batch is usually tiny so Catalyst
    broadcasts it and the live slice never shuffles; history rows are a
    pass-through union with zero shuffle. This is the MERGE pattern
    Delta/Iceberg's ``WHEN MATCHED/NOT MATCHED`` formalizes, kept
    engine-native here (ROADMAP item 2 adds the table format on top).
    Output schema: key_cols + tracked_cols + start/end/current.
    """
    out_cols = [*key_cols, *tracked_cols, start_col, end_col, current_col]
    eff = F.lit(effective_date).cast("date")
    upd = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
    ).withColumn("_u_present", F.lit(True))
    live = current.filter(F.col(current_col)).withColumn(
        "_l_present", F.lit(True)
    )
    hist = current.filter(~F.col(current_col)).select(*out_cols)
    cond = [F.col(k).eqNullSafe(F.col(f"_u_{k}")) for k in key_cols]
    # deliberately NOT cached: the three output branches below share the
    # join subtree and Catalyst dedups its shuffles (ReusedExchange), so
    # each branch re-joins from the same shuffle files — bounded extra
    # CPU, zero extra memory. Caching a 100 TB live slice would pin the
    # whole dimension in executor storage (and leak across foreachBatch
    # micro-batches in the streaming CDC sink).
    joined = live.join(upd, cond, "full_outer")
    # presence via lit(True) markers, NOT key nullability: the join is
    # eqNullSafe, so a null key component is a legal value and must not
    # make a row vanish from every branch
    has_live = F.col("_l_present").isNotNull()
    has_upd = F.col("_u_present").isNotNull()
    changed = functools.reduce(
        lambda a, b: a | b,
        [~F.col(t).eqNullSafe(F.col(f"_u_{t}")) for t in tracked_cols],
    )
    unchanged_live = joined.filter(
        has_live & (~has_upd | ~changed)
    ).select(*out_cols)
    closed = (
        joined.filter(has_live & has_upd & changed)
        .withColumn(end_col, eff.cast(joined.schema[end_col].dataType))
        .withColumn(current_col, F.lit(False))
        .select(*out_cols)
    )
    opened = (
        joined.filter(has_upd & (~has_live | changed))
        .select(
            *[
                F.coalesce(F.col(f"_u_{k}"), F.col(k)).alias(k)
                for k in key_cols
            ],
            *[F.col(f"_u_{t}").alias(t) for t in tracked_cols],
            eff.cast(joined.schema[start_col].dataType).alias(start_col),
            F.lit(None).cast(joined.schema[end_col].dataType).alias(end_col),
            F.lit(True).alias(current_col),
        )
    )
    return hist.unionByName(unchanged_live).unionByName(closed).unionByName(
        opened
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style reconciliation of two table snapshots: one row per
    changed key, tagged ``insert`` (key only in new), ``delete`` (key
    only in old), or ``update`` (present in both, any compare col
    differs null-safely). Unchanged keys produce NO output — on a
    mostly-stable 100 TB table the result is proportional to the churn,
    not the table. One full-outer join on the key columns (co-partition
    both snapshots on the same key bucketing to elide even that
    shuffle); compare columns never leave their scan until the join.
    Output: key_cols + change_type. Pair with
    ``q_table_fingerprint_orders``-style checksums to FIND which
    partitions differ, then snapshot_diff only those."""
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    ).withColumn("_o_present", F.lit(True))
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    ).withColumn("_n_present", F.lit(True))
    cond = [F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in key_cols]
    joined = o.join(n, cond, "full_outer")
    # presence markers, not key nullability: eqNullSafe makes null key
    # components legal, so they must not misclassify a row's side
    has_old = F.col("_o_present").isNotNull()
    has_new = F.col("_n_present").isNotNull()
    differs = functools.reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(~has_old, F.lit("insert"))
        .when(~has_new, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
        )
    )


def write_sorted(
    df: DataFrame, path: str, col: str, *, n_files: int = 16, mode: str = "overwrite"
) -> None:
    """1-D clustered write: range-partition by ``col`` then sort within
    partitions — every output file covers a disjoint key range, so
    row-group min/max stats prune point/range predicates on ``col`` to
    a single file (the 1-D sibling of ``write_zordered``; use that for
    two-column filter workloads). repartitionByRange samples the key
    distribution, so skewed keys still yield balanced files."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Bin-pack a parquet dataset's small files into ~target-sized ones
    (the OPTIMIZE/compaction half of what table formats automate).

    Small files are the silent killer of 100 TB scans: every file costs
    a task + footer read + open, so a streaming sink dribbling KB files
    turns a scan-bound job into a scheduler-bound one. Mechanics:
    measure current bytes from the file listing (no data read),
    ``coalesce`` — never ``repartition``, compaction must not shuffle —
    to ceil(bytes / target), and rewrite atomically via a temp dir +
    rename. Returns {files_before, files_after, bytes}. No-op (returns
    early) when the dataset already has fewer than
    ``min_files_to_compact`` data files.
    """
    import math
    import os
    import shutil

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    total = sum(os.path.getsize(f) for f in files)
    if len(files) < min_files_to_compact:
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total,
        }
    n_out = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    df = spark.read.parquet(path)
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    # sibling-rename swap, not rmtree-then-rename: a crash between
    # rmtree(path) and rename(tmp, path) would leave the dataset GONE
    # (surviving only under an undiscoverable tmp name). Renames are
    # atomic per step, so the dataset path is never absent for longer
    # than the instant between the two renames, and a crash leaves
    # either the old or the new data under a discoverable name.
    old = path.rstrip("/") + "._compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: old data restored
        raise
    shutil.rmtree(old)
    out_files = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bytes": total,
    }


def analyze_table_stats(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    *,
    columns: list[str] | None = None,
) -> dict:
    """Persist ``df`` as a catalog table and compute CBO statistics.

    Catalyst's cost-based optimizer (join reordering, build-side
    selection for non-hinted joins, cardinality-aware broadcast
    decisions) only activates on tables that CARRY statistics —
    ``spark.sql.cbo.enabled`` does nothing on bare parquet paths. At
    100 TB the stats-collection scan is amortized: ANALYZE runs once
    per ingest while every subsequent multi-join query benefits from
    a cardinality-ordered join tree instead of left-deep declaration
    order.

    Returns the recorded table-level stats (rowCount, sizeInBytes) and
    per-column distinct/null counts as plain Python values, read back
    from the catalog — proving the numbers the optimizer will see.
    """
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    out: dict = {"table": table, "columns": {}}
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row["col_name"] == "Statistics":
            out["table_stats"] = row["data_type"]
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
        for c in columns:
            stats = {
                r["info_name"]: r["info_value"]
                for r in spark.sql(
                    f"DESCRIBE TABLE EXTENDED {table} {c}"
                ).collect()
            }
            out["columns"][c] = {
                "distinct_count": stats.get("distinct_count"),
                "num_nulls": stats.get("num_nulls"),
                "max": stats.get("max"),
                "min": stats.get("min"),
            }
    return out
