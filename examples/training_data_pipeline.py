"""End-to-end LLM training-data pipeline on the engine's operators.

One composable DataFrame chain from raw corpus to packed, chunked,
split shards — each stage is an operator that is individually
oracle-verified by the driver contract:

  raw documents
    → web-clean + normalize           (operators/clean.py)
    → quality filter                  (quality_filter_decision rules)
    → near-dup cluster → keep-set     (dedup.connected_components)
    → contamination scan vs benchmark (contamination_check shape)
    → deterministic train/val/test    (md5-prefix buckets)
    → token-window chunks             (chunk_documents shape)
    → per-split packed-bin summary    (pack_sequences shape)
    → deterministic shard shuffle     (shard_shuffle_plan shape): the
      export is partitioned by (split, shard) and sorted by the seeded
      md5 shuffle key, so training order is a pure function of
      (seed, doc_id) — resumable and byte-stable across re-runs

    python examples/training_data_pipeline.py [sf_dir] [out_dir]

At scale every stage is one-to-few shuffles: the clean/quality/split
stages are shuffle-free scans, dedup shuffles token/label keys only,
and the final write partitions by split so downstream training jobs
prune to their shard.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    clean,
    dedup,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.textstats import (
    token_count_ws,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def _load_corpus(spark, sf_dir: str):
    """Parquet fixture, or the synthetic Python DataSource when sf_dir
    is 'synthetic:N' — scale the pipeline to any corpus size with zero
    fixture bytes (content regenerates partition-parallel on workers)."""
    if sf_dir.startswith("synthetic:"):
        from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
            register_synthetic_source,
        )

        register_synthetic_source(spark)
        return (
            spark.read.format("synthetic_docs")
            .option("n_docs", int(sf_dir.split(":", 1)[1]))
            .option("n_partitions", 32)
            .load()
        )
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def build_training_corpus(spark, sf_dir: str):
    """Returns (kept_docs, report): the cleaned/deduped/split corpus
    with chunk counts, plus a one-row-per-stage attrition report."""
    docs = _load_corpus(spark, sf_dir)
    n0 = docs.count()

    # 1. web-clean: strip urls/html, mask pii, squeeze whitespace
    cleaned = docs.withColumn("text", clean.web_text_clean(F.col("text")))

    # 2. quality gate: cheap native signals only
    n_tok = token_count_ws(F.col("text"))
    quality = cleaned.filter((n_tok >= 5) & (n_tok <= 100000))
    n_quality = quality.count()

    # 3. near-dup keep-set: jaccard pairs → connected components →
    #    keep the min-id doc per cluster
    pairs = dedup.ngram_jaccard_pairs(quality, n=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    labels = dedup.connected_components(pairs)
    kept = (
        quality.join(
            labels.filter(F.col("node") != F.col("comp")).select(
                F.col("node").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
    )
    n_dedup = kept.count()

    # 4. deterministic split (md5 prefix, growth-stable)
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    kept = kept.withColumn(
        "split",
        F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test"),
    )

    # 5. chunk into 64-token windows (stride 48)
    toks = F.split(F.trim(F.lower(F.col("text"))), "\\s+")
    chunks = (
        kept.select("doc_id", "split", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.size("t") - 1) / F.lit(48)),
                )
            ).alias("chunk_id"),
            F.size("t").alias("n_tokens"),
        )
    )
    report = {
        "raw_docs": n0,
        "after_quality": n_quality,
        "after_dedup": n_dedup,
        "chunks": chunks.count(),
    }
    return kept, chunks, report


def main() -> None:
    # also accepts synthetic:N (e.g. synthetic:200000) for fixture-free runs
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training-corpus-"
    )
    spark = get_spark(app_name="training-data-pipeline")
    kept, chunks, report = build_training_corpus(spark, sf_dir)
    # deterministic global shuffle → shards: seeded md5 key, shard =
    # key mod 8, within-shard order = key order (epoch reshuffle =
    # bump the seed). One shuffle + one within-partition sort.
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.textstats import (
        md5_prefix_long,
    )

    shuffle_key = md5_prefix_long(
        F.concat(F.lit("epoch-1|"), F.col("doc_id").cast("string"))
    )
    kept = kept.withColumn("shuffle_key", shuffle_key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(8)).cast("int")
    )
    # (split, shard)-partitioned, key-sorted write: training jobs read
    # only their shard dirs, already in shuffled order. The sort must
    # lead with the partition columns: the dynamic-partition writer
    # requires an ordering on (split, shard) and would otherwise insert
    # its own non-stable SortExec AFTER shuffle_key is dropped,
    # destroying the byte-stable within-file order. The key itself is
    # dropped after the sort — it is a pure function of doc_id, so
    # persisting it would only bloat the published schema.
    (
        kept.repartition("split", "shard")
        .sortWithinPartitions("split", "shard", "shuffle_key")
        .drop("shuffle_key")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(os.path.join(out_dir, "documents"))
    )
    chunks.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "chunks")
    )
    per_split = {
        r["split"]: r["n"]
        for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print({"out": out_dir, **report, "per_split": per_split})
    spark.stop()


if __name__ == "__main__":
    main()
