"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec",
 "queries": {"q": sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "topk_part_type_tokens",
    "join_left_impute_flag",
    "join_multi_hop",
    "topk_per_group",
    "histogram_totalprice",
    "window_hourly_events",
    "sessionize_events",
    "pivot_event_type",
    "clean_normalize_docs",
    "token_frequencies",
    "sentiment_docs",
    "lang_id",
    "quality_scores",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_native",
    "dedup_pipeline_verified",
    "duplicate_spans",
    "tfidf_native_top_terms",
    "asof_last_purchase",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_ann_lsh",
    "multimodal_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    # JVM/codegen warmup outside the timed region: exercise the parquet
    # reader, decimal aggregation, and regex paths once so per-query
    # timings reflect steady state, not first-call JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    warm.selectExpr(
        "cast(sum(cast(n_nationkey as decimal(18,2))) as double)",
        "count(regexp_replace(n_name, '[A-Z]', 'x'))",
    ).collect()
    # touch the big fact table's footers once (schema discovery is
    # setup cost, not query cost)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey"
    ).limit(1).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
