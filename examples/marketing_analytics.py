"""Marketing / experimentation analytics on the engine's operators.

One session, seven attribution-and-experimentation readouts — each
backed by an oracle-verified registry query (docs/QUERIES.md batches
9-21), composed the way a growth team would actually run them:

  funnel            strict-order view→click→purchase conversion
  cohort            signup-cohort retention matrix
  rfm               quintile customer segmentation (distributed ranks)
  shapley           game-theoretic channel attribution (set-based)
  markov_removal    absorbing-chain removal effects (path-based)
  paths             top in-session 3-step event sequences
  ab                Welch t-test + exact Mann-Whitney AUC on the same
                    two cohorts — parametric and rank-based agreement
                    is the sanity cross-check

    python examples/marketing_analytics.py [sf_dir]

Scale shape: every readout is one or two key-local shuffles over the
events table; the attribution math (coalition algebra, value
iteration) runs on constant-sized tables, never the facts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans import (
    queries as Q,
)


def build_marketing_report(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Every value is a lazily-planned DataFrame; callers pick which
    readouts to materialize (nothing collects here)."""
    return {
        "funnel": Q.q_funnel_conversion(spark, sf_dir),
        "cohort": Q.q_cohort_retention(spark, sf_dir),
        "rfm": Q.q_rfm_segments(spark, sf_dir),
        "shapley": Q.q_shapley_channel_attribution(spark, sf_dir),
        "markov_removal": Q.q_markov_removal_attribution(spark, sf_dir),
        "paths": Q.q_event_path_trigrams(spark, sf_dir),
        "ab_t_test": Q.q_welch_t_test_events(spark, sf_dir),
        "ab_auc": Q.q_auc_value_purchase(spark, sf_dir),
    }


def main() -> None:
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    report = build_marketing_report(spark, sf_dir)
    for name, df in report.items():
        print(f"== {name} ==")
        df.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
