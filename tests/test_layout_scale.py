"""Physical-layout scale tests: assert the PLAN properties that matter
at 100 TB — partition pruning, shuffle-free bucketed joins, broadcast
joins, filter pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    layout,
    relational,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("part_key", (F.col("id") % 10).cast("int"))
    path = str(tmp_path / "partitioned")
    layout.write_partitioned(df, path, ["part_key"])
    scan = spark.read.parquet(path).filter(F.col("part_key") == 3)
    plan = _optimized_explain(scan)
    assert "PartitionFilters" in plan
    # only one of ten partition dirs should survive pruning
    assert scan.count() == 100
    files = scan.select(F.input_file_name()).distinct().collect()
    assert all("part_key=3" in r[0] for r in files)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    layout.write_bucketed(left, "t_left", "id", n_buckets=8)
    layout.write_bucketed(right, "t_right", "id", n_buckets=8)
    # tiny tables would be broadcast (which bypasses bucketing); force
    # the merge-join path the layout exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = layout.bucketed_join(spark, "t_left", "t_right", "id")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "BroadcastExchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE t_left")
        spark.sql("DROP TABLE t_right")


def test_dim_join_is_broadcast(spark):
    fact = spark.range(0, 10000).withColumn("k", (F.col("id") % 100))
    dim = spark.range(0, 100).withColumnRenamed("id", "k").withColumn(
        "attr", F.col("k") * 10
    )
    joined = relational.join_dim(fact, dim, on="k", how="left")
    plan = _executed_plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_parquet(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.range(0, 1000).withColumn("x", F.col("id") % 7).write.parquet(path)
    scan = spark.read.parquet(path).filter(F.col("x") > 3).select("x")
    plan = _optimized_explain(scan)
    assert "PushedFilters: [IsNotNull(x), GreaterThan(x,3)]" in plan
    # column pruning: id must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "id" not in read_schema


def test_zorder_value_interleaving(spark):
    """Z-value matches a Python reference bit-interleave."""
    def z_ref(a: int, b: int, bits: int = 21) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67), (2**20, 2**20 - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b", layout.zorder_value("a", "b").alias("z")).collect()
    for r in out:
        assert r["z"] == z_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_write_improves_file_skipping(spark, tmp_path):
    """After z-ordered write, each file covers a narrow range of BOTH
    dims → a point-ish filter on either column touches few files."""
    n = 4096
    df = spark.range(n).selectExpr(
        "cast(id % 64 as long) as x", "cast(id div 64 as long) as y"
    )
    path = str(tmp_path / "zord")
    layout.write_zordered(df, path, "x", "y", n_files=16)
    scan = spark.read.parquet(path)
    total_files = scan.select(F.input_file_name()).distinct().count()
    touched = (
        scan.filter((F.col("x") >= 8) & (F.col("x") < 16))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    # an un-clustered layout would touch every file for this filter
    assert touched < total_files


def test_topk_plans_take_ordered(spark):
    df = spark.range(0, 10000).withColumn("v", F.col("id") % 997)
    top = relational.top_k(df, [F.col("v").desc()], 5)
    assert "TakeOrderedAndProject" in _executed_plan(top)


def test_upsert_into_partitioned(spark, tmp_path):
    """Dynamic-partition MERGE: only touched partitions rewritten;
    latest version wins per key; inserts land; other partitions'
    files are physically untouched."""
    import os

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
        upsert_into_partitioned,
    )

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 30, 1), (4, "c", 40, 1)],
        "id long, part string, val long, version long",
    )
    base.write.partitionBy("part").parquet(path)

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    fp = os.path.join(root, n)
                    out[fp] = os.path.getmtime(fp)
        return out

    before = {f: m for f, m in files(path).items() if "part=b" in f or "part=c" in f}

    updates = spark.createDataFrame(
        [(2, "a", 99, 2),   # update existing key in partition a
         (5, "a", 50, 2)],  # insert new key into partition a
        "id long, part string, val long, version long",
    )
    upsert_into_partitioned(
        spark, updates, path,
        key_cols=["id"], partition_col="part", version_col="version",
    )
    got = {
        r["id"]: (r["part"], r["val"], r["version"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", 10, 1), 2: ("a", 99, 2), 5: ("a", 50, 2),
        3: ("b", 30, 1), 4: ("c", 40, 1),
    }
    after = {f: m for f, m in files(path).items() if "part=b" in f or "part=c" in f}
    assert before == after, "untouched partitions were rewritten"


def test_upsert_version_tie_prefers_update(spark, tmp_path):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
        upsert_into_partitioned,
    )

    path = str(tmp_path / "ds2")
    spark.createDataFrame(
        [(1, "a", 10, 1)], "id long, part string, val long, version long"
    ).write.partitionBy("part").parquet(path)
    upsert_into_partitioned(
        spark,
        spark.createDataFrame(
            [(1, "a", 11, 1)], "id long, part string, val long, version long"
        ),
        path, key_cols=["id"], partition_col="part", version_col="version",
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0]["val"] == 11


def test_compact_small_files(spark, tmp_path):
    """64 tiny files bin-pack into far fewer target-sized ones with the
    data byte-identical; an already-compact dataset is a no-op."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        layout,
    )

    path = str(tmp_path / "small")
    spark.range(10_000).toDF("id").repartition(64).write.parquet(path)
    import os

    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 64
    report = layout.compact_small_files(
        spark, path, target_file_bytes=64 * 1024
    )
    assert report["files_before"] == 64
    assert report["files_after"] < 16
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg({"id": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
    # idempotent-ish: second pass finds the compacted layout
    again = layout.compact_small_files(
        spark, path, target_file_bytes=64 * 1024
    )
    assert again["files_after"] <= report["files_after"]


def test_analyze_table_stats_feeds_cbo(spark):
    """ANALYZE writes rowCount + per-column NDV into the catalog — the
    numbers join reordering needs; values match the data exactly."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
        analyze_table_stats,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 37).alias("grp")
    )
    out = analyze_table_stats(
        spark, df, "cbo_stats_probe", columns=["id", "grp"]
    )
    assert "1000 rows" in out["table_stats"]
    assert out["columns"]["grp"]["distinct_count"] == "37"
    assert out["columns"]["id"]["num_nulls"] == "0"
    # the numbers must reach the OPTIMIZER, not just the catalog: with
    # CBO on, the optimized plan's cost model sees the analyzed rowCount
    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("cbo_stats_probe")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert int(str(stats.rowCount().get())) == 1000
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
    spark.sql("DROP TABLE IF EXISTS cbo_stats_probe")


def test_zorder_value_n_generalizes(spark):
    """N-way Morton: 2-col variant matches zorder_value bit-for-bit;
    3-col interleaving is order-preserving per dimension on the locality
    property that matters — equal prefixes cluster together — and a
    3-col clustered table format rewrite prunes on the third column."""
    from pyspark.sql import Row, functions as F

    df = spark.createDataFrame(
        [Row(a=i % 8, b=(i // 8) % 8, c=i % 4) for i in range(64)]
    )
    rows = df.select(
        layout.zorder_value("a", "b").alias("z2"),
        layout.zorder_value_n(["a", "b"], bits=21).alias("zn"),
    ).collect()
    assert all(r["z2"] == r["zn"] for r in rows)
    # 3 columns: distinct inputs get distinct codes at sufficient bits
    codes = df.select(
        layout.zorder_value_n(["a", "b", "c"]).alias("z")
    ).collect()
    assert len(codes) == 64
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_value_n(["a", "b", "c"], bits=32)


def test_optimize_cluster_three_columns(spark, tmp_path):
    """table_format.optimize_cluster with 3 columns: data-identical and
    the third column's per-file stats become selective."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        table_format as tf,
    )
    from pyspark.sql import Row

    root = str(tmp_path / "t")
    rows = [
        Row(a=i % 16, b=(i * 7) % 16, c=(i * 3) % 16, k=i)
        for i in range(4096)
    ]
    tf.create_table(
        spark.createDataFrame(rows).repartition(8),
        root,
        stat_cols=["a", "b", "c"],
    )
    v = tf.optimize_cluster(spark, root, ["a", "b", "c"], target_files=8)
    assert tf.table_diff(spark, root, 0, v).count() == 0
    live, _ = tf.snapshot_files(root, v)
    # each clustered file must cover well under the full 0..15 span on c
    spans = [
        a["stats"]["c"][1] - a["stats"]["c"][0]
        for a in live
        if a["stats"]["c"][0] is not None
    ]
    assert spans and sum(spans) / len(spans) < 15


def test_upsert_preserves_null_partition_rows(spark, tmp_path):
    """An update batch touching the NULL partition must not delete the
    pre-existing null-partition rows it didn't supersede: isin([None])
    evaluates to NULL and previously excluded them from the rewrite."""
    from pyspark.sql import Row
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
        upsert_into_partitioned,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [Row(k=1, p="a", v=1), Row(k=2, p=None, v=1), Row(k=3, p=None, v=1)],
        "k long, p string, v int",
    )
    base.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [Row(k=2, p=None, v=2)], "k long, p string, v int"
    )
    upsert_into_partitioned(
        spark, updates, path, key_cols=["k"], partition_col="p",
        version_col="v",
    )
    got = {(r["k"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a", 1), (2, None, 2), (3, None, 1)}, got
