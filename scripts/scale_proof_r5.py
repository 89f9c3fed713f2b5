"""Round-5 decade scale-proof (VERDICT r4 #6): the five most expensive
window queries at sf1-equivalent volume (10x the bench SF), fixture-free.

Builds two synthetic sf-dirs with the SAME generator — a 1x control at
bench scale (5k docs / 2k vectors, matching sf0.1's row counts) and a
10x target (50k docs / 20k vectors, sf1-equivalent) — then runs each
query end-to-end via the registry and reports the wall-clock growth
ratio. Linear ops should land near 10x or below (fixed overheads
amortize); pair-output growth is quantified separately where the
operator's OUTPUT is quadratic in duplicate density by definition.

Run from the repo root (the Python DataSource must be importable on
workers):  python scripts/scale_proof_r5.py [mult]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
    register_synthetic_source,
)

FIVE = [
    "sentiment_vader_full",
    "dedup_cluster_canonical",
    "semdedup_keep_set",
    "dedup_minhash_native",
    "bpe_tokenized_stats",
]

BASE_DOCS, BASE_VECS, DIM = 5_000, 2_000, 64


def build_sf_dir(spark, root: str, n_docs: int, n_vecs: int) -> str:
    os.makedirs(root, exist_ok=True)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", 32)
        .load()
    )
    docs.write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))
    # deterministic pseudo-random embeddings: sin-hash per (vec_id, dim)
    emb = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}),"
                " d -> cast(sin(id * 9973 + d * 131) as float))"
            ).alias("embedding"),
            (F.col("id") % 10).cast("int").alias("label"),
        )
        .repartition(32)
    )
    emb.write.mode("overwrite").parquet(os.path.join(root, "embeddings.parquet"))
    return root


def run_five(spark, sf_dir: str) -> dict[str, dict]:
    out = {}
    for name in FIVE:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"  {name}: {out[name]}", flush=True)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-proof-r5")
    register_synthetic_source(spark)
    small = build_sf_dir(
        spark, "/tmp/scale_r5/base", BASE_DOCS, BASE_VECS
    )
    big = build_sf_dir(
        spark, "/tmp/scale_r5/big", BASE_DOCS * mult, BASE_VECS * mult
    )
    # warm-up pass (discarded): codegen compilation and JIT are fixed
    # costs that would otherwise inflate the 1x leg and flatter the
    # ratio (first cut measured sentiment_vader_full at 0.34x!)
    print("warm-up (untimed):", flush=True)
    run_five(spark, small)
    print(f"1x ({BASE_DOCS} docs / {BASE_VECS} vecs):", flush=True)
    r1 = run_five(spark, small)
    print(f"{mult}x ({BASE_DOCS * mult} docs / {BASE_VECS * mult} vecs):", flush=True)
    r10 = run_five(spark, big)
    report = {
        name: {
            "sec_1x": r1[name]["sec"],
            f"sec_{mult}x": r10[name]["sec"],
            "time_ratio": round(r10[name]["sec"] / max(r1[name]["sec"], 1e-9), 2),
            "rows_1x": r1[name]["rows"],
            f"rows_{mult}x": r10[name]["rows"],
            "rows_ratio": round(
                r10[name]["rows"] / max(r1[name]["rows"], 1), 2
            ),
        }
        for name in FIVE
    }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
