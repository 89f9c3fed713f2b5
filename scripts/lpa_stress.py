"""Scale stress for bounded-round label propagation (the
label_propagation_communities plan): edge construction (basket pair
join + support>=2 filter) and the two groupBy-min rounds measured at
sf0.01 and sf0.1 (10x the lineitem rows). The pass condition is the
growth factor of wall time vs the growth factor of the edge list —
the plan's cost is proportional to edges (two key-partitioned
shuffles), not to any quadratic blow-up, because the basket cap (<=20
items) bounds pair generation per order and support>=2 prunes the
long tail. Results to SCALING.md.

    python scripts/lpa_stress.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def main() -> None:
    spark = get_spark(app_name="lpa-stress")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warmup
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t0 = time.perf_counter()
        rows = QUERIES["label_propagation_communities"](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # edge-list size for the cost-proportionality readout
        from pyspark.sql import functions as F

        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        items = li.select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"),
        ).distinct()
        ok = items.groupBy("basket").agg(F.count("*").alias("n")).filter(
            "n <= 20"
        )
        it = items.join(F.broadcast(ok.select("basket")), "basket")
        edges = (
            it.alias("a")
            .join(it.alias("b"), "basket")
            .filter("a.item != b.item")
            .groupBy("a.item", "b.item")
            .agg(F.count("*").alias("s"))
            .filter("s >= 2")
            .count()
        )
        print(
            f"{os.path.basename(sf_dir)}: {dt:.2f} s, "
            f"{edges} support>=2 edges, top community "
            f"{rows[0]['community_size'] if rows else 0}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
