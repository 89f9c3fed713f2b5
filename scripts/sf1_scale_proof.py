"""Round-9 unified sf1 scale-proof (VERDICT r8 next-step #4): the
top-10 most expensive bench queries (by the r8 IDLE archive,
bench_archive/BENCH_LOCAL-3ad74a6f.json) run once at 10x bench volume,
as ONE cross-cutting data point behind the per-operator stress scripts.

Two synthetic sf-dirs are built with the same recipe so the ratio is
apples-to-apples:

- control (1x): the relational + events tables are the driver's sf0.1
  parquet verbatim; documents come from the repo's synthetic_docs
  source at sf0.1's row count (5k) and embeddings from the sin-hash
  generator (2k x 64) — the same fixture-free device
  scripts/scale_proof_r5.py used.
- target (10x = sf1-equivalent): relational + events tables replicated
  10x with disjoint key offsets (explode over copy ids + key shift:
  FK integrity preserved within each copy, per-key cardinalities and
  skew profile preserved, calendar span UNCHANGED — more traffic over
  the same period, exactly how a real 10x scale-up looks); nation and
  region stay fixed like real TPC-H scaling; 50k docs / 20k vectors.

Scale-flat queries should show time ratios near (or below) 10x, i.e.
sec-per-row growth <= ~1.3x; anything above gets named and explained
in docs/SCALING.md.

    python scripts/sf1_scale_proof.py [mult]
"""

from __future__ import annotations

import json
import os
import shutil
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

# slowest-10 of the r8 idle archive, most expensive first
TOP10 = [
    "theil_sen_trend",
    "markov_removal_attribution",
    "lakehouse_star_rollup",
    "dedup_prefix_filter",
    "lakehouse_deletion_vectors",
    "lakehouse_incremental_rollup",
    "sentiment_vader_full",
    "graph_bfs_copurchase",
    "graph_weighted_paths",
    "similarity_pq_adc",
    # 11th: the r8 registry addition sits right behind the ten
    "lakehouse_distinct_rollup",
    # r11 additions: the hardened integer-exact sampler and the new
    # grid-histogram winsorize twin — their scale claims (one bounded
    # broadcast back onto a single fact scan; window only over the
    # KB-scale histogram) get the same 10x measurement as the
    # slowest-11
    "mixture_sample_docs",
    "winsorized_value_stats_grid",
    # r13 additions (VERDICT r12 #9): the late-r12 fusion query and
    # the two ml.feature replay twins — posting-list shuffles over
    # bounded top-15 lists; banded signature join; bucket-collision
    # join against a fixed query set
    "search_rrf_fusion",
    "dedup_minhash_ml_replay",
    "similarity_brp_ml_replay",
]

SRC = "/root/testdata/sf0.1"
# key columns shifted per copy (FKs move together; nation/region keys
# keep their original 25/5-value domain, like real TPC-H scaling)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
CAP = 10_000_000
BASE_DOCS, BASE_VECS, DIM = 5_000, 2_000, 64


def synth_docs_embeddings(spark, root: str, n_docs: int, n_vecs: int) -> None:
    docs = (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", 32)
        .load()
    )
    docs.write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))
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


def build_dir(spark, root: str, mult: int) -> str:
    os.makedirs(root, exist_ok=True)
    for name in ["region", "nation"]:
        dst = os.path.join(root, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SRC, f"{name}.parquet"), dst)
    for name, keys in KEYS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        if mult > 1:
            df = df.withColumn(
                "_copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.col("_copy") * CAP)
            df = df.drop("_copy")
        df.write.mode("overwrite").parquet(os.path.join(root, f"{name}.parquet"))
    synth_docs_embeddings(spark, root, BASE_DOCS * mult, BASE_VECS * mult)
    return root


def run_all(spark, sf_dir: str) -> dict[str, dict]:
    out = {}
    for name in TOP10:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"  {name}: {out[name]}", flush=True)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="sf1-scale-proof")
    register_synthetic_source(spark)
    print("building control (1x) ...", flush=True)
    ctl = build_dir(spark, "/tmp/sfx_ctl", 1)
    print(f"building target ({mult}x) ...", flush=True)
    big = build_dir(spark, "/tmp/sfx_big", mult)
    # BOTH legs get an identical untimed warm-up pass: JIT/codegen and
    # page-cache first-touch are fixed costs, and warming only the
    # control (the first cut) systematically inflates the ratio — a
    # scale-flat query could be falsely named a scaling regression.
    print("warm-up 1x (untimed):", flush=True)
    run_all(spark, ctl)
    print(f"warm-up {mult}x (untimed):", flush=True)
    run_all(spark, big)
    print("1x (sf0.1-equivalent):", flush=True)
    r1 = run_all(spark, ctl)
    print(f"{mult}x (sf1-equivalent):", flush=True)
    r10 = run_all(spark, big)
    report = {
        name: {
            "sec_1x": r1[name]["sec"],
            f"sec_{mult}x": r10[name]["sec"],
            "time_ratio": round(
                r10[name]["sec"] / max(r1[name]["sec"], 1e-9), 2
            ),
            "sec_per_row_growth": round(
                r10[name]["sec"] / max(r1[name]["sec"], 1e-9) / mult, 2
            ),
            "rows_1x": r1[name]["rows"],
            f"rows_{mult}x": r10[name]["rows"],
        }
        for name in TOP10
    }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
