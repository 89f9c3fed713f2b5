"""Streaming medallion pipeline: stream → bronze lakehouse → maintained
silver views, exactly-once under kill-and-replay.

The single end-to-end showcase of the storage stack (the r7 roadmap's
"medallion demo"): a deterministic-replayable document stream lands in
a bronze lakehouse table through the exactly-once ``foreachBatch``
sink, and every micro-batch folds the bronze change feed forward into
silver rollup views incrementally (O(churn), never O(source) — see
operators/ivm.py). The run then

  1. drains half the stream and stops (a "kill"),
  2. restarts from the SAME checkpoint and drains the rest — the
     normal crash-recovery path: offsets resume, batch ids continue,
  3. manually REPLAYS an already-committed micro-batch against the
     sink — the at-least-once case Structured Streaming's contract
     allows — and asserts the batch-id ledger makes it a no-op,
  4. cross-checks every silver view against a cold batch recompute
     over the final bronze snapshot.

Runs in well under a minute on local[*]:

    python examples/medallion_streaming.py [work_dir]

At scale the shapes hold: the sink's merge-on-read upsert writes
O(batch) per micro-batch (deletion vectors, zero rewrite of bronze
data files), and each view refresh reads only the commits it has not
folded yet.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    ivm,
    table_format as tf,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
    register_synthetic_source,
)

BATCH = 40
HALF, FULL = 120, 200  # docs drained before/after the simulated kill


def _drain(spark, bronze, views, ckpt, max_docs) -> None:
    """Run the stream until the bounded source is dry, then stop —
    each call is one "process lifetime" between kills."""
    q = (
        spark.readStream.format("synthetic_docs")
        .option("docs_per_batch", BATCH)
        .option("max_docs", max_docs)
        .load()
        .writeStream.foreachBatch(
            ivm.maintained_sink(bronze, views, key_col="doc_id",
                                merge_mode="mor")
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    # the bounded source returns empty batches at max_docs, so a full
    # drain terminates (Python stream readers don't support
    # Trigger.AvailableNow — it silently degrades to one batch)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="medallion-"
    )
    bronze = os.path.join(work, "bronze_docs")
    silver_src = os.path.join(work, "silver_by_source")
    silver_lang = os.path.join(work, "silver_by_lang")
    ckpt = os.path.join(work, "ckpt")
    for p in (bronze, silver_src, silver_lang, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    spark = get_spark(app_name="medallion-streaming")
    register_synthetic_source(spark)

    # ---- bronze seed + silver views ------------------------------------
    # Version 0 of bronze is the first stream batch's worth of docs read
    # through the BATCH leg of the same source (content is a pure
    # function of (seed, doc_id), so the stream's batch 0 upserts
    # identical rows — a no-op merge, proving CDC-upsert idempotency on
    # overlapping ranges too).
    seed = spark.read.format("synthetic_docs").option("n_docs", BATCH).load()
    tf.create_table(seed, bronze, stat_cols=["doc_id"])
    ivm.create_rollup(spark, bronze, silver_src,
                      keys=["source"], sum_cols=["n_chars"])
    ivm.create_rollup(spark, bronze, silver_lang,
                      keys=["lang"], minmax_cols=["n_chars"])
    views = [silver_src, silver_lang]

    # ---- lifetime 1: drain to HALF, then "crash" -----------------------
    _drain(spark, bronze, views, ckpt, HALF)
    n_half = tf.read_table(spark, bronze).count()
    assert n_half == HALF, n_half

    # ---- lifetime 2: restart from the SAME checkpoint ------------------
    _drain(spark, bronze, views, ckpt, FULL)
    live = tf.read_table(spark, bronze)
    assert live.count() == FULL
    assert live.select("doc_id").distinct().count() == FULL  # exactly once

    # ---- at-least-once replay: re-deliver a committed batch ------------
    head_before = tf.latest_version(bronze)
    replayed_ids = sorted(tf.committed_batch_ids(bronze))
    replay_bid = replayed_ids[-1]
    replay_df = (
        spark.read.format("synthetic_docs").option("n_docs", FULL).load()
        .filter(F.col("doc_id") >= FULL - BATCH)
    )
    ivm.maintained_sink(bronze, views, key_col="doc_id", merge_mode="mor")(
        replay_df, replay_bid
    )
    assert tf.latest_version(bronze) == head_before, "replay must be a no-op"
    assert tf.read_table(spark, bronze).count() == FULL

    # ---- silver == cold batch recompute over the final bronze ----------
    by_source = {
        r["source"]: (r["n_rows"], r["sum_n_chars"])
        for r in ivm.read_rollup(spark, silver_src).collect()
    }
    want_source = {
        r["source"]: (r["c"], r["s"])
        for r in live.groupBy("source")
        .agg(F.count("*").alias("c"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert by_source == want_source, (by_source, want_source)
    by_lang = {
        r["lang"]: (r["n_rows"], r["min_n_chars"], r["max_n_chars"])
        for r in ivm.read_rollup(spark, silver_lang).collect()
    }
    want_lang = {
        r["lang"]: (r["c"], r["lo"], r["hi"])
        for r in live.groupBy("lang")
        .agg(F.count("*").alias("c"), F.min("n_chars").alias("lo"),
             F.max("n_chars").alias("hi"))
        .collect()
    }
    assert by_lang == want_lang, (by_lang, want_lang)

    print({
        "work": work,
        "bronze_docs": FULL,
        "bronze_versions": tf.latest_version(bronze) + 1,
        "batches_committed": len(replayed_ids),
        "replayed_batch_noop": True,
        "silver_by_source": by_source,
        "silver_by_lang": by_lang,
    })
    spark.stop()


if __name__ == "__main__":
    main()
