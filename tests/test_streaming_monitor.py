"""StreamingQueryListener progress capture + stop-all teardown."""

from __future__ import annotations

import time

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.monitor import (
    capture_progress,
    stop_all_streams,
)


def test_capture_progress_records_batches(spark, tmp_path):
    with capture_progress(spark) as cap:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1000)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 30
        while not cap.progress and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    assert cap.started, "no start event captured"
    assert cap.progress, "no progress events captured"
    p = cap.progress[-1]
    # the wire-format fields a metrics backend consumes
    assert "numInputRows" in p and "durationMs" in p and "id" in p
    # listener removed on exit: further queries must not append
    n_before = len(cap.progress)
    q2 = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    time.sleep(2)
    q2.stop()
    q2.awaitTermination(30)
    assert len(cap.progress) == n_before, "listener leaked past the block"


def test_stop_all_streams_stops_everything(spark, tmp_path):
    for i in range(2):
        (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 100)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / f"s{i}"))
            .start()
        )
    assert len(spark.streams.active) >= 2
    n = stop_all_streams(spark)
    assert n >= 2
    assert len(spark.streams.active) == 0
