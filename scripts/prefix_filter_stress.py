"""Candidate-pruning measurement for the PPJoin-style prefix filter vs
the full inverted-index self-join, on the synthetic corpus with planted
hot boilerplate (the pathology that makes the naive join quadratic).
Results go to docs/SCALING.md.

    python scripts/prefix_filter_stress.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.dedup import (
    prefix_filter_pairs,
    shingle,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
    register_synthetic_source,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark()
    register_synthetic_source(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n_docs", n)
        .option("n_partitions", 32)
        .load()
        # plant hot boilerplate on every third doc — the footer that
        # pairs unrelated docs in a naive inverted join
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" all rights reserved contact support for details"),
                ),
            ).otherwise(F.col("text")),
        )
    )
    docs.persist().count()

    # full inverted-index candidate pairs (pre-verification volume)
    sh = shingle(docs, n=3)
    inv = sh.select(
        F.col("doc_id").alias("_id"), F.explode("shingles").alias("_g")
    )
    t = time.time()
    full_cand = (
        inv.alias("a")
        .join(inv.alias("b"), "_g")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    full_s = time.time() - t

    # prefix-filtered candidates: re-derive the operator's prefix join
    dfreq = inv.groupBy("_g").agg(F.count("*").alias("_df"))
    sz = inv.groupBy("_id").agg(F.count("*").alias("_sz"))
    w = Window.partitionBy("_id").orderBy("_df", "_g")
    prefix = (
        inv.join(dfreq, "_g")
        .join(sz, "_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_sz") - F.expr("(_sz * 3 + 4) div 5") + 1)
        .select("_id", "_g")
    )
    t = time.time()
    pf_cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "_g")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    pf_s = time.time() - t

    t = time.time()
    n_pairs = prefix_filter_pairs(docs, n=3, threshold_frac=(3, 5)).count()
    e2e_s = time.time() - t
    print(
        f"n_docs={n}: full_join_candidates={full_cand} ({full_s:.1f}s)  "
        f"prefix_candidates={pf_cand} ({pf_s:.1f}s)  "
        f"reduction={full_cand / max(pf_cand, 1):.1f}x  "
        f"end_to_end_pairs={n_pairs} ({e2e_s:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
