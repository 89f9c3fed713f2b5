"""Verify named queries against their DuckDB oracles at several SFs."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (  # noqa: E402
    ORACLE, QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (  # noqa: E402
    get_spark,
)
from oracle_harness import compare  # noqa: E402

names = sys.argv[1:]
spark = get_spark(app_name="verify_sf_sweep")
ok = True
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    sf_dir = f"/root/testdata/{sf}"
    for name in names:
        r = compare(spark, QUERIES[name], ORACLE[name], sf_dir)
        good = r["count_match"] and r["schema_match"] and r["value_match"] and r.get("kind_policy_ok", True)
        ok = ok and good
        print(json.dumps({"sf": sf, "query": name, "ok": good,
                          **{k: r[k] for k in ("count_match", "schema_match", "value_match")}}), flush=True)
spark.stop()
sys.exit(0 if ok else 1)
