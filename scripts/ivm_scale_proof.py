"""Scale proof for incremental view maintenance: refresh cost must be
O(churn), flat in SOURCE size.

Builds lakehouse sources of increasing row counts, materializes the
same rollup over each, applies an IDENTICAL fixed-size churn commit
(delete of one key range + append), and times `refresh_rollup`. If the
fold were secretly O(source) — a snapshot re-scan hiding anywhere in
the feed, delta, or merge path — the refresh time would scale with the
source; churn-proportionality predicts a flat line (within Spark fixed
overheads). Also times the full recompute for contrast.

Run: PYTHONPATH=/root/repo python scripts/ivm_scale_proof.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, SparkSession, functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    ivm,
    table_format as tfmt,
)

CHURN = 2_000  # rows touched per refresh, IDENTICAL at every size


def run(spark: SparkSession, n_rows: int) -> dict:
    base = tempfile.mkdtemp(prefix=f"ivm_scale_{n_rows}_")
    src, view = os.path.join(base, "src"), os.path.join(base, "view")
    try:
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 500).alias("g"),
            (F.col("id") * 3).alias("val"),
        )
        tfmt.create_table(
            df.repartitionByRange(16, "k"), src, stat_cols=["k"]
        )
        ivm.create_rollup(
            spark, src, view, keys=["g"], sum_cols=["val"],
            minmax_cols=["val"],
        )
        # fixed churn: delete an interior key band + append CHURN rows
        lo = n_rows // 2
        tfmt.delete_where(
            spark, src, f"k >= {lo} AND k < {lo + CHURN}", prune_col="k"
        )
        tfmt.append(
            spark.range(n_rows, n_rows + CHURN).select(
                F.col("id").alias("k"),
                (F.col("id") % 500).alias("g"),
                (F.col("id") * 3).alias("val"),
            ),
            src,
        )
        t0 = time.time()
        ivm.refresh_rollup(spark, view)
        refresh_s = time.time() - t0
        t0 = time.time()
        tfmt.read_table(spark, src).groupBy("g").agg(
            F.count(F.lit(1)), F.sum("val"), F.min("val"), F.max("val")
        ).collect()
        recompute_s = time.time() - t0
        return {
            "n_rows": n_rows,
            "refresh_s": round(refresh_s, 2),
            "full_recompute_s": round(recompute_s, 2),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ivm-scale-proof")
        .getOrCreate()
    )
    out = [run(spark, n) for n in (100_000, 400_000, 1_600_000)]
    print(json.dumps({"churn_rows": CHURN, "points": out}))
    spark.stop()


if __name__ == "__main__":
    main()
