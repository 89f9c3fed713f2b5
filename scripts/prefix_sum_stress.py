"""Scale stress for relational.distributed_prefix_sum: cumulative-sum
2M vs 20M rows (10x) through the range-bucketed operator, against the
single-partition-window baseline at both sizes. Checksum: the sum of
an inclusive prefix sum of all-ones over a total order is n(n+1)/2,
so both plans are verified exact before being timed. Results go to
docs/SCALING.md.

    python scripts/prefix_sum_stress.py [small] [big]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
    distributed_prefix_sum,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def rows(spark, n):
    # non-monotonic key so range bucketing actually has to work
    return spark.range(n, numPartitions=32).select(
        F.xxhash64("id").alias("k"), "id", F.lit(1).alias("v")
    )


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in (small, big):
        df = rows(spark, n)
        t = time.time()
        got = (
            distributed_prefix_sum(df, ["k", "id"], "v", out_col="ps")
            .agg(F.count("*").alias("n"), F.sum("ps").alias("s"))
            .collect()[0]
        )
        dist_s = time.time() - t
        assert got["n"] == n and got["s"] == n * (n + 1) // 2, got
        t = time.time()
        w = Window.orderBy("k", "id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        got2 = (
            df.withColumn("ps", F.sum("v").over(w))
            .agg(F.count("*").alias("n"), F.sum("ps").alias("s"))
            .collect()[0]
        )
        single_s = time.time() - t
        assert got2["s"] == n * (n + 1) // 2, got2
        print(
            f"n={n}: distributed={dist_s:.1f}s single_window={single_s:.1f}s "
            f"speedup={single_s / dist_s:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
