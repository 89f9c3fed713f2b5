"""ALS collaborative filtering over the purchase graph.

Matrix factorization is the one ml-tier capability class the engine
lacked (classification, featurization, tuning, clustering and Word2Vec
are covered elsewhere): customers x parts from orders ⋈ lineitem form
the implicit-feedback matrix, `pyspark.ml.recommendation.ALS` factors
it (the distributed blocked-ALS the platform ships — user/item factor
blocks co-partitioned, no driver-side matrix), and top-k
recommendations come from `recommendForAllUsers` (blocked cross
products, executor-side top-k).

Scale notes (100 TB): ALS shuffles (user, item, rating) triples into
factor blocks once per sweep; rank and block count bound executor
memory, never the raw matrix. Ratings use ln(1+purchases) — implicit
confidence damping — computed from exact integer counts so the input
matrix is engine-deterministic even though the factorization itself is
seeded-iterative (hence rows-only + property tests, not a SQL oracle;
the same contract as the MinHash/IVF families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_ratings(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(user, item, rating) implicit-feedback triples: rating =
    ln(1 + n_purchases) from exact integer counts. Ids cast to INT
    (the ml ALS id domain); the purchase count groupBy is the only
    shuffle."""
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user",
            "item",
            F.log(F.lit(1.0) + F.col("n")).cast("float").alias("rating"),
        )
    )


def train_als(
    ratings: DataFrame,
    *,
    rank: int = 8,
    max_iter: int = 10,
    reg: float = 0.02,
    seed: int = 100,
):
    """Fit blocked ALS; coldStartStrategy=drop so scoring never emits
    NaN for unseen ids (the documented ml contract)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        nonnegative=True,
    )
    return als.fit(ratings)


def recommend_items(model, k: int = 3) -> DataFrame:
    """Top-k items per user, exploded to (user, item, rec_rank) —
    executor-side blocked top-k, nothing collects to the driver."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("rec_rank", "rec"),
    ).select(
        "user",
        F.col("rec.item").alias("item"),
        (F.col("rec_rank") + 1).alias("rec_rank"),
    )


def reconstruction_rmse(model, ratings: DataFrame) -> float:
    """Train-set RMSE of the factorization — the sanity floor the
    property test pins (a rank-8 factorization of a sparse implicit
    matrix must beat the trivial global-mean predictor)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    pred = model.transform(ratings)
    return RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    ).evaluate(pred)


def build_ratings_portable(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Engine-portable (user, item, rating) triples: identical join +
    count as :func:`build_ratings`, but the rating stays DOUBLE and
    rounds to 6 decimals — ``ln`` is not correctly rounded in either
    engine's libm, and the float32 cast the ml path uses has no DuckDB
    twin, so the portable variant pins the value both engines agree
    on bit-for-bit after rounding."""
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").cast("long").alias("user"),
            F.col("l_partkey").cast("long").alias("item"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user",
            "item",
            F.round(F.log(F.lit(1.0) + F.col("n")), 6).alias("rating"),
        )
    )


def als_rank1_fixed(
    ratings: DataFrame, *, iterations: int = 2, factor_round: int = 9
) -> DataFrame:
    """Fixed-iteration rank-1 ALS, DataFrame-native and
    oracle-reproducible → ('user'|'item', id, factor).

    The deterministic certificate twin of the seeded ml.ALS flagship
    (the same promotion kmeans_fixed gave ml.KMeans): at rank 1 each
    alternating half-step has the CLOSED FORM
    ``u_i = Σ_j r_ij·v_j / Σ_j v_j²`` over the user's observed items
    (and symmetrically for items), so a fixed iteration count turns the
    factorization into a finite declarative plan a SQL oracle replays
    as unrolled CTEs. Determinism across engines: item factors
    initialize to 1.0 (no RNG); every numerator/denominator sum passes
    through DECIMAL(28,12) (partial-aggregation-order independent);
    each half-step's factors round to ``factor_round`` before the next
    step consumes them. All factors stay strictly positive (ratings are
    ln(1+n) > 0 and v₀ = 1), so the divides can never hit zero.

    Scale shape per half-step: ONE equi-join of the ratings triples
    against the bounded factor side + one map-side-combined groupBy —
    exactly the data motion of a blocked ALS sweep at rank 1. Nothing
    driver-side except the loop counter.
    """
    if iterations < 1:
        raise ValueError(
            f"iterations must be >= 1 (got {iterations}): the user-side "
            "factors only exist after the first alternating half-step"
        )
    dec = "decimal(28,12)"
    # r14: the ratings triples feed EVERY half-step (plus v0) — the
    # lazily-unrolled plan recomputed the orders ⋈ lineitem build 5x
    # (36 parquet scans, plans/r14/als_rank1_factors_before.txt).
    # Materialize them ONCE; each half-step's factors pin too (the
    # next sweep AND the final union both consume them). Measured
    # against a two-layout (by-item + by-user repartitioned) variant:
    # identical at sf0.1 (both within host noise of the unpinned
    # plan, whose 36 scans are cheap and fully parallel there), but
    # the single pin adds the fewest barriers while removing the 5x
    # join recompute that dominates at scale (guide §1.2).
    r_by_item = r_by_user = ratings.localCheckpoint(eager=True)
    v = r_by_item.select("item").distinct().select(
        "item", F.lit(1.0).alias("f")
    )
    u = None
    for _ in range(iterations):
        u = (
            r_by_item.join(v, "item")
            .groupBy("user")
            .agg(
                F.round(
                    F.sum((F.col("rating") * F.col("f")).cast(dec)).cast(
                        "double"
                    )
                    / F.sum((F.col("f") * F.col("f")).cast(dec)).cast(
                        "double"
                    ),
                    factor_round,
                ).alias("f")
            )
            .localCheckpoint(eager=True)
        )
        v = (
            r_by_user.join(u, "user")
            .groupBy("item")
            .agg(
                F.round(
                    F.sum((F.col("rating") * F.col("f")).cast(dec)).cast(
                        "double"
                    )
                    / F.sum((F.col("f") * F.col("f")).cast(dec)).cast(
                        "double"
                    ),
                    factor_round,
                ).alias("f")
            )
            .localCheckpoint(eager=True)
        )
    return u.select(
        F.lit("user").alias("role"),
        F.col("user").alias("id"),
        F.round("f", 6).alias("factor"),
    ).unionByName(
        v.select(
            F.lit("item").alias("role"),
            F.col("item").alias("id"),
            F.round("f", 6).alias("factor"),
        )
    )
