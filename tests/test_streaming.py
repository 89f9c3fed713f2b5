"""Structured Streaming tests: deterministic memory-source/sink
harness replacing the reference's manual socket test (SURVEY.md §5.3)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.pipeline import (
    train_and_evaluate,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
    score_stream,
    sessionize_stream,
    stream_dedup_within_watermark,
    windowed_event_counts,
)


def _await_query(q, timeout_s: int = 60):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout_s)


def _train_tiny_model(spark):
    pos = [("great amazing wonderful food", 1.0)] * 30
    neg = [("terrible awful rude service", 0.0)] * 30
    df = spark.createDataFrame(pos + neg, "text string, label double")
    fitted, _ = train_and_evaluate(df, "svm")
    return fitted


def test_score_stream_end_to_end(spark, tmp_path):
    """Files source → clean → PipelineModel.transform → memory sink.
    The declarative replacement for foreachRDD scoring
    (Prediction_Pipe_Line.py:41-92)."""
    model = _train_tiny_model(spark)
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch0.txt").write_text(
        "  Great!!! amazing wonderful food 123\nterrible awful rude service...\n"
    )
    lines = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(src))
        .withColumnRenamed("value", "value")
    )
    scored = score_stream(lines, model)
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _await_query(q)
    rows = {r["text"]: r["sentiment"] for r in spark.sql("select * from scored_stream").collect()}
    assert rows["Great amazing wonderful food"] == "Positive"
    assert rows["terrible awful rude service"] == "Negative"


def test_windowed_event_counts_stream(spark, tmp_path):
    """Event-time tumbling windows + watermark over a file stream."""
    import json

    src = tmp_path / "ev"
    src.mkdir()
    events = [
        {"ts": "2024-01-01T00:05:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01T00:20:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01T01:10:00", "event_type": "view", "value": 3.0},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, event_type string, value double")
        .load(str(src))
    )
    out = windowed_event_counts(stream, window_duration="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    _await_query(q)
    rows = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert rows[("2024-01-01 00:00:00", "click")] == 2
    assert rows[("2024-01-01 01:00:00", "view")] == 1


def test_stream_dedup_within_watermark(spark, tmp_path):
    import json

    src = tmp_path / "dd"
    src.mkdir()
    events = [
        {"ts": "2024-01-01T00:00:00", "k": "a"},
        {"ts": "2024-01-01T00:01:00", "k": "a"},  # dup within watermark
        {"ts": "2024-01-01T00:02:00", "k": "b"},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, k string")
        .load(str(src))
    )
    out = stream_dedup_within_watermark(stream, ["k"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    _await_query(q)
    ks = sorted(r["k"] for r in spark.sql("select * from dedup_stream").collect())
    assert ks == ["a", "b"]


def test_sessionize_stream(spark, tmp_path):
    import json

    src = tmp_path / "sess"
    src.mkdir()
    events = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1},
        {"ts": "2024-01-01T00:10:00", "user_id": 1},  # same session
        {"ts": "2024-01-01T02:00:00", "user_id": 1},  # new session
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, user_id long")
        .load(str(src))
    )
    out = sessionize_stream(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    _await_query(q)
    rows = spark.sql("select * from sessions").collect()
    assert sorted(r["n_events"] for r in rows) == [1, 2]


def _train_tiny_quality_model(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.quality import (
        train_quality_classifier,
    )

    # the hashed-n-gram LR only knows the vocabulary it saw at fit
    # time, so the training corpus must share tokens with the text the
    # stream test scores ("great amazing wonderful food ...")
    long_good = (
        "this is a perfectly reasonable document with plenty of real "
        "words in ordinary sentences that passes every heuristic " * 6
    )
    shared_good = ("great amazing wonderful food " * 10).strip()
    junk = "### ### ### ... ... ... ### #"
    docs = spark.createDataFrame(
        [(long_good,)] * 15 + [(shared_good,)] * 15 + [(junk,)] * 30,
        "text string",
    )
    model, _ = train_quality_classifier(docs, min_tokens=20)
    return model


def test_score_stream_multihead_end_to_end(spark, tmp_path):
    """Sentiment + quality heads over ONE files-source stream, memory
    sink: the LLM tier's train->deploy->stream capstone (r5)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        score_stream_multihead,
    )

    sent_model = _train_tiny_model(spark)
    qual_model = _train_tiny_quality_model(spark)
    src = tmp_path / "in_mh"
    src.mkdir()
    good = (
        "great amazing wonderful food " * 10
    ).strip()  # long + positive -> quality, Positive
    (src / "b0.txt").write_text(
        f"{good}\nterrible awful rude service...\n"
    )
    lines = (
        spark.readStream.format("text").schema("value string").load(str(src))
    )
    scored = score_stream_multihead(lines, sent_model, qual_model)
    q = (
        scored.writeStream.format("memory")
        .queryName("multihead_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .start()
    )
    _await_query(q)
    rows = {
        r["text"]: r
        for r in spark.sql("select * from multihead_stream").collect()
    }
    assert len(rows) == 2
    long_row = next(r for t, r in rows.items() if len(t) > 100)
    short_row = next(r for t, r in rows.items() if len(t) <= 100)
    assert long_row["sentiment"] == "Positive"
    assert short_row["sentiment"] == "Negative"
    assert long_row["is_quality"] and not short_row["is_quality"]
    assert 0.0 <= short_row["q_probability"] <= 1.0

    # batch twin: identical plan shape on a bounded frame
    batch = spark.createDataFrame(
        [(good,), ("terrible awful rude service...",)], "value string"
    )
    brows = {
        r["text"]: r
        for r in score_stream_multihead(batch, sent_model, qual_model).collect()
    }
    assert {(r["sentiment"], r["is_quality"]) for r in brows.values()} == {
        (r["sentiment"], r["is_quality"]) for r in rows.values()
    }
