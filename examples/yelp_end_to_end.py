"""End-to-end demo: the reference's entire workload on this engine.

Mirrors the five reference scripts in ~60 lines:
ETL → EDA → model comparison → deploy → stream scoring.

    python examples/yelp_end_to_end.py /path/to/yelp_csvs /tmp/model_out

With no args it runs on a tiny inline corpus.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans import (
    yelp_flow,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.schemas import (
    YELP_BUSINESS,
    YELP_REVIEW,
    YELP_USER,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
    read_csv,
    split_quarantine,
)


def _inline_tables(spark):
    reviews = [
        (f"r{i}", f"u{i % 5}", f"b{i % 3}", str(1 + i % 5), "2020-01-01",
         ("great amazing food!!!" if i % 5 >= 3 else "terrible awful service..."),
         "1", "1", "1")
        for i in range(200)
    ]
    review = spark.createDataFrame(reviews, YELP_REVIEW)
    user = spark.createDataFrame(
        [(f"u{i}", "None" if i else "2018") for i in range(5)], YELP_USER
    )
    business = spark.createDataFrame(
        [(f"b{i}", "AZ", "Restaurants;Bars") for i in range(3)], YELP_BUSINESS
    )
    return review, user, business


def main() -> None:
    spark = get_spark(app_name="yelp_end_to_end")
    if len(sys.argv) >= 2:
        base = sys.argv[1]
        review = split_quarantine(
            read_csv(spark, os.path.join(base, "yelp_review.csv"), YELP_REVIEW)
        )[0]
        user = split_quarantine(
            read_csv(spark, os.path.join(base, "yelp_user.csv"), YELP_USER)
        )[0]
        business = split_quarantine(
            read_csv(spark, os.path.join(base, "yelp_business.csv"), YELP_BUSINESS)
        )[0]
    else:
        review, user, business = _inline_tables(spark)
    model_path = sys.argv[2] if len(sys.argv) >= 3 else tempfile.mkdtemp()

    cleaned = yelp_flow.preprocess(review, user, business).cache()
    print("--- star distribution")
    yelp_flow.eda_star_distribution(cleaned).show()
    print("--- top categories (positive reviews)")
    yelp_flow.eda_top_categories(cleaned, k=5).show()
    print("--- elite vs non-elite")
    yelp_flow.eda_elite_vs_non(cleaned).show()
    print("--- model comparison (F1)")
    yelp_flow.compare_models(cleaned).show()
    fitted, f1 = yelp_flow.deploy(cleaned, os.path.join(model_path, "svm_pipeline"))
    print(f"--- deployed PipelineModel (f1={f1:.3f}) to {model_path}")

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        score_stream,
    )

    lines = spark.createDataFrame(
        [("  This place was great, amazing food!!",),
         ("terrible awful experience, rude staff...",)],
        "value string",
    )
    print("--- stream-scoring two raw lines (batch frame, same code path)")
    score_stream(lines, fitted).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
