"""Fixture-free scale stress: key operators at 20k vs 200k synthetic
docs (10×), measuring the growth ratio of each. Linear ops should come
in near 10× or below (fixed overheads amortize); anything superlinear
is a scale bug. Results go to docs/SCALING.md.

    python scripts/synthetic_stress.py [small] [big]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    bpe,
    dedup,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
    register_synthetic_source,
)


def corpus(spark, n):
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n)
        .option("n_partitions", 32)
        .load()
    )


def run_ops(spark, n) -> dict[str, float]:
    out = {}
    docs = corpus(spark, n)

    def timed(label, action):
        t = time.time()
        action()
        out[label] = round(time.time() - t, 2)

    timed("generate_count", lambda: docs.count())
    timed("dedup_exact", lambda: dedup.dedup_exact(docs).count())
    timed(
        "minhash_native_candidates",
        lambda: dedup.minhash_native_candidates(docs).count(),
    )
    timed("bpe_3_merges", lambda: bpe.learn_bpe_merges(docs, n_merges=3).count())

    def bm25_index():
        toks = docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("term"),
        )
        toks.groupBy("doc_id", "term").agg(
            F.count("*").alias("tf")
        ).count()

    timed("inverted_index_build", bm25_index)

    def card():
        base = docs.select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
            F.md5(F.col("text")).alias("fp"),
        )
        base.groupBy("source", "fp").agg(
            F.count("*").alias("c"), F.sum("n_tok").alias("t")
        ).groupBy("source").agg(F.sum("c"), F.count("*")).count()

    timed("data_card_rollup", card)
    return out


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(
        app_name="synthetic-stress",
        extra_conf={"spark.driver.memory": "8g"},
    )
    register_synthetic_source(spark)
    run_ops(spark, small)  # warmup: codegen/JIT paid outside timing
    a = run_ops(spark, small)
    b = run_ops(spark, big)
    ratios = {k: round(b[k] / a[k], 2) if a[k] > 0 else None for k in a}
    print(json.dumps({"small": small, "big": big, "t_small": a, "t_big": b,
                      "ratio": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
