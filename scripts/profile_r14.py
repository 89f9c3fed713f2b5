"""Round-14 optimization profiler: isolated per-query timing + plan dump.

Usage:
    python scripts/profile_r14.py --reps 3 [--plans plans/r14 --tag before] q1 q2 ...

For each named query: optionally write `.explain('formatted')` to
`<plans>/<name>_<tag>.txt`, then time `collect()` (the bench's
methodology) `--reps` times in one warmed session and print every rep
so host-weather swings are visible. Job descriptions label each rep for
the UI. Timings go to stdout as one JSON line per query.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="profile_r14")
    sf_dir = args.sf_dir
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    warm.selectExpr(
        "cast(sum(cast(n_nationkey as decimal(18,2))) as double)",
        "count(regexp_replace(n_name, '[A-Z]', 'x'))",
    ).collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey"
    ).limit(1).collect()

    for name in args.names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name, "times": times, "min": min(times),
            "rows": len(rows), "sf_dir": sf_dir,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
