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

    # --- data-management tier (broadcast-shaped: should be ~flat) ---
    def scd2():
        from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
            scd2_merge,
        )

        current = docs.select(
            "doc_id",
            F.col("source").alias("seg"),
            F.lit("1995-01-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        updates = docs.filter(F.col("doc_id") % 100 == 0).select(
            "doc_id", F.lit("moved").alias("seg")
        )
        scd2_merge(
            current,
            updates,
            key_cols=["doc_id"],
            tracked_cols=["seg"],
            effective_date="1996-06-01",
        ).count()

    timed("scd2_merge_1pct_updates", scd2)

    def snap_diff():
        from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.layout import (
            snapshot_diff,
        )

        old = docs.select("doc_id", "source")
        new = docs.filter(F.col("doc_id") % 97 != 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 100 == 0, F.lit("moved"))
            .otherwise(F.col("source"))
            .alias("source"),
        )
        snapshot_diff(
            old, new, key_cols=["doc_id"], compare_cols=["source"]
        ).count()

    timed("snapshot_diff_2pct_churn", snap_diff)

    def wsample():
        from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
            weighted_sample_per_group,
        )

        with_w = docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        weighted_sample_per_group(
            with_w, group_col="source", id_col="doc_id", weight_col="w", k=100
        ).count()

    timed("weighted_sample_k100", wsample)

    def shard():
        from pyspark.sql import Window

        from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.textstats import (
            md5_prefix_long,
        )

        h = md5_prefix_long(
            F.concat(F.lit("e1|"), F.col("doc_id").cast("string"))
        )
        w = Window.partitionBy("shard").orderBy("k")
        docs.select("doc_id", h.alias("k")).withColumn(
            "shard", F.pmod(F.col("k"), F.lit(32)).cast("int")
        ).withColumn("pos", F.row_number().over(w)).count()

    timed("shard_shuffle_plan", shard)
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
