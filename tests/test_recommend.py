"""ALS collaborative-filtering properties (ml/recommend.py): the
factorization is seeded-iterative (no SQL oracle — the MinHash/IVF
contract), so evidence is property-based: it must beat the trivial
global-mean predictor, recommend exactly k in-vocabulary items per
user, and be seed-deterministic within a session."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.recommend import (
    build_ratings,
    recommend_items,
    reconstruction_rmse,
    train_als,
)

SF = "/root/testdata/sf0.001"


def _ratings(spark):
    return build_ratings(
        spark.read.parquet(f"{SF}/orders.parquet"),
        spark.read.parquet(f"{SF}/lineitem.parquet"),
    )


def test_als_beats_global_mean_and_recommends_k(spark):
    r = _ratings(spark).cache()
    model = train_als(r)
    rmse = reconstruction_rmse(model, r)
    sd = r.agg(F.stddev("rating")).collect()[0][0]
    # the global-mean predictor's train RMSE is the rating stddev;
    # a rank-8 factorization must do strictly better
    assert rmse < sd, (rmse, sd)

    recs = recommend_items(model, 3)
    per_user = recs.groupBy("user").agg(F.count("*").alias("n"))
    assert per_user.filter(F.col("n") != 3).count() == 0
    # every recommended item exists in the training vocabulary
    vocab = {row["item"] for row in r.select("item").distinct().collect()}
    sample = {row["item"] for row in recs.limit(200).collect()}
    assert sample <= vocab
    # ranks are 1..3 with rank-1 scoring highest per construction
    assert {row["rec_rank"] for row in recs.limit(50).collect()} <= {1, 2, 3}


def test_als_seed_deterministic(spark):
    r = _ratings(spark).cache()
    a = train_als(r, max_iter=3)
    b = train_als(r, max_iter=3)
    top_a = {
        (row["user"], row["item"])
        for row in recommend_items(a, 1).limit(100).collect()
    }
    top_b = {
        (row["user"], row["item"])
        for row in recommend_items(b, 1).limit(100).collect()
    }
    assert top_a == top_b
