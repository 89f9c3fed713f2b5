"""Saturation sweep for stream_near_dup_pairs: drive the rate source
up until steady-state trigger latency crosses the 1 s processing
interval, print one JSON line per rate so SCALING.md can record the
knee. Run: python scripts/stream_saturation.py [rates...]"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
    stream_near_dup_pairs,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def docs_stream(spark, rate: int):
    """Duplicate-heavy synthetic docs: value % 500 -> ~rate/500 docs per
    near-dup family per second at steady state."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(w) for w in VOCAB]),
                        (((F.col("value") % 500) % (i + 3)) % 10 + 1).cast("int"),
                    )
                    for i in range(12)
                ],
            ).alias("text"),
        )
    )


def measure(spark, rate: int, settle: float = 20.0, max_state: int = 2000) -> dict:
    q = (
        stream_near_dup_pairs(docs_stream(spark, rate), max_state_per_band=max_state)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"sat-{rate}-"))
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(settle)
    progress = [p for p in q.recentProgress if p is not None]
    q.stop()
    q.awaitTermination(30)
    # steady state: drop the first half (warmup / state build-up)
    rows = [p for p in progress if p["numInputRows"] > 0]
    rows = rows[len(rows) // 2 :]
    if not rows:
        return {"rate": rate, "n_triggers": 0}
    lat = [p["durationMs"]["triggerExecution"] for p in rows]
    rps = [p["processedRowsPerSecond"] for p in rows]
    return {
        "rate": rate,
        "rows_per_sec": round(sum(rps) / len(rps), 1),
        "trigger_ms_avg": round(sum(lat) / len(lat), 1),
        "trigger_ms_max": max(lat),
        "n_triggers": len(rows),
        "saturated": sum(lat) / len(lat) > 1000,
    }


def main() -> None:
    rates = [int(a) for a in sys.argv[1:]] or [500, 1000, 2000, 4000, 8000]
    spark = get_spark(app_name="stream-saturation")
    out = []
    for r in rates:
        m = measure(spark, r)
        out.append(m)
        print(json.dumps(m), flush=True)
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:  # noqa: BLE001
            pass
    spark.stop()
    sys.stdout.flush()
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
