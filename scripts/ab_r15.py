"""Round-15 interleaved A/B harness for the three r14 perf-suspect
changes (VERDICT r14 "next round" #1).

One warmed session; per rep the variants run back-to-back (A, B, A, B,
...) so host weather hits both sides equally — the failure mode that
contaminated r14's cross-window stamps. Variants toggle via env vars
the operators read at query-BUILD time (temporary hooks, removed once
the winners ship):

  SPARK_GRAFT_AB_SIGPIN  — minhash_native_candidates signature pin
  SPARK_GRAFT_AB_VSPREAD — near_dup_verified candidate repartition
  SPARK_GRAFT_AB_BFFUSE  — bellman_ford fused FULL OUTER round

Usage: python scripts/ab_r15.py <query> <ENV_VAR> [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (  # noqa: E402
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("env_var")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ab_r15")
    sf_dir = args.sf_dir
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey"
    ).limit(1).collect()

    times: dict[str, list[float]] = {"1": [], "0": []}
    # warm both variants once (JIT/codegen) before the timed reps
    for v in ("1", "0"):
        os.environ[args.env_var] = v
        QUERIES[args.query](spark, sf_dir).collect()
    for rep in range(args.reps):
        for v in ("1", "0"):
            os.environ[args.env_var] = v
            spark.sparkContext.setJobDescription(
                f"ab {args.query} {args.env_var}={v} rep{rep}"
            )
            t0 = time.perf_counter()
            QUERIES[args.query](spark, sf_dir).collect()
            times[v].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    out = {
        "query": args.query,
        "toggle": args.env_var,
        "on": times["1"],
        "off": times["0"],
        "on_min": min(times["1"]),
        "off_min": min(times["0"]),
        "winner": "on" if min(times["1"]) <= min(times["0"]) else "off",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
