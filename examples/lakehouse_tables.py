"""Lakehouse table-format walkthrough (operators/table_format.py +
sources/lakehouse_stream.py) — the Delta/Iceberg-substitute metadata
layer, end to end on plain parquet:

  create (stats-indexed)            v0
    → blind append                  v1
    → stats-pruned DELETE           v2   (pruned files never opened)
    → copy-on-write MERGE           v3   (only overlapping files rewritten)
    → CLUSTER BY rewrite            v4   (data-identical; near-disjoint
                                          per-file ranges => pruning bites)
    → time travel + change feed          (any version; churn-proportional)
    → incremental materialized view      (CDF-fold refresh, never a re-scan)
    → streaming: format("lakehouse") read / foreachBatch exactly-once sink
    → vacuum                             (age-guarded orphan reclaim)

    python examples/lakehouse_tables.py [sf_dir] [table_root]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    table_format as tf,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.lakehouse_stream import (
    register_lakehouse_source,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="lakehouse_demo_"
    )
    spark = get_spark(app_name="lakehouse-demo")
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    v0 = tf.create_table(
        cust.filter("c_mktsegment = 'BUILDING'").repartitionByRange(4, "c_custkey"),
        root,
        stat_cols=["c_custkey"],
    )
    v1 = tf.append(cust.filter("c_mktsegment = 'AUTOMOBILE'"), root)
    v2 = tf.delete_where(spark, root, "c_custkey <= 50", prune_col="c_custkey")
    # materialize the rollup view here (at v2); the later refresh folds
    # the merge + cluster commits from the change feed alone
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        ivm,
    )

    view_root = root + "_rollup"
    shutil.rmtree(view_root, ignore_errors=True)
    ivm.create_rollup(
        spark, root, view_root,
        keys=["c_mktsegment"], sum_cols=["c_acctbal"],
        minmax_cols=["c_custkey"],
    )
    updates = cust.filter("c_mktsegment = 'MACHINERY'").withColumn(
        "c_mktsegment", F.lit("UPSERTED")
    )
    v3 = tf.merge_upsert(updates, root, key_col="c_custkey")
    v4 = tf.optimize_cluster(spark, root, ["c_custkey"], target_files=4)
    # merge-on-read: mask rows via a deletion-vector sidecar (no data
    # file rewritten), then RESTORE rolls the head back — metadata only
    v5 = tf.delete_where(spark, root, "c_custkey % 3 = 0", mode="mor")
    n_masked = tf.read_table(spark, root).count()
    v6 = tf.restore_table(root, v4)
    print(f"DV delete v{v5}: {n_masked} rows visible; "
          f"restore v{v6}: {tf.read_table(spark, root).count()} rows")
    print(f"versions committed: {v0}..{v6}")
    for h in tf.history(root):
        print("  ", h)

    for v in (0, 2, 4):
        n = tf.read_table(spark, root, version=v).count()
        print(f"time travel v{v}: {n} rows")

    feed = tf.table_changes(spark, root, 0, 3)
    print("change feed (0, 3]:")
    feed.groupBy("_commit_version", "_change_type").count().orderBy(
        "_commit_version", "_change_type"
    ).show()

    # incremental materialized view, created mid-lineage at v2: the
    # refresh folds the merge + cluster commits' change feed only —
    # never a source re-scan (the cluster commit's feed cancels empty)
    vv = ivm.refresh_rollup(spark, view_root)
    print(f"materialized rollup refreshed to view v{vv} "
          f"(src v{ivm.rollup_state(view_root)['src_version']}):")
    ivm.read_rollup(spark, view_root, with_avg=True).orderBy(
        "c_mktsegment"
    ).show()
    shutil.rmtree(view_root, ignore_errors=True)

    register_lakehouse_source(spark)
    snap = spark.read.format("lakehouse").option("path", root).load()
    print("batch DataSource read:",
          snap.count(), "rows,",
          snap.select("_commit_version").distinct().count(), "writing versions")

    orphans = tf.vacuum(root, retain_versions=99, min_age_seconds=0)
    print(f"vacuum reclaimed {len(orphans)} unreferenced files")

    if len(sys.argv) <= 2:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
