"""Round-14 whole-registry plan triage: dump every query's formatted
plan at sf0.1 (build-time actions included, no collect) and tabulate
smell metrics — parquet scan count (recompute proxy), exchanges,
windows, Python eval nodes, cartesian products, sort-merge joins.
Writes plans/r15/triage.json. Run: python scripts/triage_r14.py
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import re
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
    spark = get_spark(app_name="triage_r14")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
            p = buf.getvalue()
            out[name] = {
                "scans": len(re.findall(r"\(\d+\) Scan parquet", p)),
                "rdd": len(re.findall(r"\(\d+\) Scan ExistingRDD", p)),
                "exch": len(re.findall(r"\(\d+\) Exchange", p)),
                "bexch": len(re.findall(r"\(\d+\) BroadcastExchange", p)),
                "win": len(re.findall(r"\(\d+\) Window", p)),
                "py": len(re.findall(r"EvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", p)),
                "cart": len(re.findall(r"CartesianProduct", p)),
                "smj": len(re.findall(r"SortMergeJoin", p)),
                "nodes": len(re.findall(r"^\(\d+\)", p, re.M)),
                "build_s": round(time.perf_counter() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200],
                         "build_s": round(time.perf_counter() - t0, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    with open("plans/r15/triage.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
