"""End-to-end Yelp workload parity on synthetic dirty fixtures
(FIXTURES.md shapes): preprocess → EDA → train → persist → stream-score.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans import (
    yelp_flow,
)

POS = ["great", "amazing", "delicious", "wonderful", "friendly", "fantastic"]
NEG = ["terrible", "awful", "rude", "disgusting", "slow", "dirty"]


@pytest.fixture(scope="module")
def yelp_tables(spark):
    rng = random.Random(42)
    reviews = []
    for i in range(300):
        stars = rng.choice([1, 2, 3, 4, 5])
        words = POS if stars >= 4 else NEG
        text = f"  The food was {rng.choice(words)}!!! really {rng.choice(words)}, 10/10"
        reviews.append(
            (
                f"rev_{i:05d}",
                f"user_{rng.randrange(40):03d}",
                f"biz_{rng.randrange(20):03d}",
                str(stars),
                "2020-01-01",
                text,
                str(rng.randrange(5)),
                str(rng.randrange(5)),
                str(rng.randrange(5)),
            )
        )
    # dirty rows: mis-parsed stars, null text, null funny (FIXTURES.md §1)
    reviews.append(("rev_bad1", "user_001", "biz_001", "2017", "d", "junk", "0", "0", "0"))
    reviews.append(("rev_bad2", "user_002", "biz_002", "9", "d", "junk", "0", "0", "0"))
    reviews.append(("rev_bad3", "user_003", "biz_003", "5", "d", None, "0", "0", "0"))
    reviews.append(("rev_bad4", "user_004", "biz_004", "5", "d", "ok food", None, "0", "0"))
    review = spark.createDataFrame(
        reviews,
        "review_id string, user_id string, business_id string, stars string, "
        "date string, text string, useful string, funny string, cool string",
    )
    users = [(f"user_{i:03d}", "None" if i % 20 else "2017,2018") for i in range(40)]
    users += users[:5]  # duplicate rows → exercises dropDuplicates
    user = spark.createDataFrame(users, "user_id string, elite string")
    cats = ["Restaurants;Bars", "Restaurants;Cafes", "Shopping", "0", "Nightlife;Bars"]
    biz = [(f"biz_{i:03d}", "AZ", cats[i % 5]) for i in range(20)]
    biz += biz[:3]
    business = spark.createDataFrame(biz, "business_id string, state string, categories string")
    return review, user, business


@pytest.fixture(scope="module")
def cleaned(yelp_tables):
    return yelp_flow.preprocess(*yelp_tables).cache()


def test_preprocess_drops_dirty_rows(cleaned):
    ids = {r["review_id"] for r in cleaned.select("review_id").collect()}
    assert cleaned.count() == 300
    assert not any(i.startswith("rev_bad") for i in ids)


def test_preprocess_text_normalized(cleaned):
    texts = [r["text"] for r in cleaned.limit(20).collect()]
    import re

    for t in texts:
        assert not re.search(r"[!/0-9]|\s{2,}|^\s", t), t
    assert all(t.startswith("The food was") for t in texts)


def test_preprocess_joins_dims(cleaned):
    assert cleaned.filter(F.col("categories").isNull()).count() == 0
    assert cleaned.filter(F.col("elite").isNull()).count() == 0


def test_eda_star_distribution(cleaned):
    dist = {r["stars"]: r["count"] for r in yelp_flow.eda_star_distribution(cleaned).collect()}
    assert set(dist) == {"1", "2", "3", "4", "5"}
    assert sum(dist.values()) == 300


def test_eda_top_categories_excludes_junk(cleaned):
    top = [r["category"] for r in yelp_flow.eda_top_categories(cleaned, k=5).collect()]
    assert "0" not in top and "1" not in top
    assert top[0] == "Restaurants"  # most frequent by construction


def test_eda_elite_vs_non(cleaned):
    rows = yelp_flow.eda_elite_vs_non(cleaned).collect()
    elite_count = sum(r["count"] for r in rows if r["is_elite"] == 1)
    non_count = sum(r["count"] for r in rows if r["is_elite"] == 0)
    assert elite_count + non_count == 300
    assert 0 < elite_count < non_count  # elites are the 1-in-20 minority


def test_eda_word_histogram(cleaned):
    rows = yelp_flow.eda_word_count_histogram(cleaned).collect()
    assert sum(r["count"] for r in rows) == 300


def test_eda_sentiment_sign_tracks_label(cleaned):
    scored = yelp_flow.eda_sentiment_scores(cleaned).join(
        cleaned.select("review_id", "label"), "review_id"
    )
    agg = scored.groupBy((F.col("label") >= 4).alias("pos")).agg(
        F.avg("sentiment").alias("s")
    )
    vals = {r["pos"]: r["s"] for r in agg.collect()}
    assert vals[True] > 0 > vals[False]


def test_full_train_deploy_stream(cleaned, spark, tmp_path):
    """The reference's whole lifecycle: train+persist one PipelineModel,
    reload, score a 'stream' of raw lines (batch frame through the same
    code path streaming uses)."""
    from pyspark.ml import PipelineModel

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        score_stream,
    )

    path = str(tmp_path / "yelp_svm")
    fitted, f1 = yelp_flow.deploy(cleaned, path)
    assert f1 > 0.85
    reloaded = PipelineModel.load(path)
    lines = spark.createDataFrame(
        [("  The food was amazing!!! really wonderful, 10/10",),
         ("The food was terrible... really rude, 0/10",)],
        "value string",
    )
    out = {r["text"]: r["sentiment"] for r in score_stream(lines, reloaded).collect()}
    assert list(out.values()) == ["Positive", "Negative"]
