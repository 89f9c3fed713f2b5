"""Scale stress for the grid-bucketed bounded-radius spatial NN join
(the spatial_grid_nearest plan): grid probe vs brute-force bounded
cross join. The brute-force baseline runs only at the small size (its
candidate volume is n·m); the grid plan runs at 10x and its growth
factor is the pass condition. Equality of per-key nearest results at
the small size proves the 3x3 probe lossless. Results to SCALING.md.

    python scripts/spatial_stress.py [n_small] [m_small] [scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)

CELL = 125_000
WORLD = 1_000_000


def points(spark, n, salt):
    return spark.range(n, numPartitions=32).select(
        F.col("id"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(salt))) % WORLD).alias("x"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(salt + "y"))) % WORLD).alias(
            "y"
        ),
    )


def grid_nearest(cust, supp):
    c = cust.withColumn(
        "cell", F.expr(f"(x div {CELL}) * 1000 + (y div {CELL})")
    )
    s = supp.select(
        F.col("id").alias("sid"),
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
    ).select(
        "sid",
        "sx",
        "sy",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(-1, 1), dx ->
                    transform(sequence(-1, 1), dy ->
                      (sx div {CELL} + dx) * 1000
                        + (sy div {CELL} + dy))))"""
            )
        ).alias("cell"),
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    return (
        c.join(s, "cell")
        .withColumn("d2", d2)
        .filter(F.col("d2") <= CELL * CELL)
        .groupBy("id")
        .agg(F.min(F.col("d2") * 10_000_000 + F.col("sid")).alias("enc"))
    )


def brute_nearest(cust, supp):
    s = supp.select(
        F.col("id").alias("sid"),
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    return (
        cust.crossJoin(F.broadcast(s))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= CELL * CELL)
        .groupBy("id")
        .agg(F.min(F.col("d2") * 10_000_000 + F.col("sid")).alias("enc"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    cust, supp = points(spark, n, "c"), points(spark, m, "s")
    cust.persist().count(), supp.persist().count()
    t = time.time()
    g = {r["id"]: r["enc"] for r in grid_nearest(cust, supp).collect()}
    grid_small = time.time() - t
    t = time.time()
    b = {r["id"]: r["enc"] for r in brute_nearest(cust, supp).collect()}
    brute_small = time.time() - t
    assert g == b, f"grid != brute: {len(g)} vs {len(b)} matched keys"
    print(
        f"n={n} m={m}: grid={grid_small:.1f}s brute={brute_small:.1f}s "
        f"(equal nearest for {len(g)} matched customers)"
    )

    cust2, supp2 = points(spark, n * scale, "c"), points(spark, m * scale, "s")
    cust2.persist().count(), supp2.persist().count()
    t = time.time()
    big = grid_nearest(cust2, supp2).count()
    grid_big = time.time() - t
    print(
        f"n={n * scale} m={m * scale}: grid={grid_big:.1f}s "
        f"({big} matched) growth={grid_big / grid_small:.1f}x for "
        f"{scale}x data (brute candidates would grow {scale * scale}x)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
