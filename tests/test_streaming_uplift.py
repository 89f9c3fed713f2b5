"""Streaming uplift: stream-static joins, foreachBatch sinks, socket
source construction, ML tuning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_stream_static_join(spark, tmp_path):
    """Unbounded stream enriched against a static dim (SURVEY.md §7
    step 4 uplift) — map-side broadcast per micro-batch, no state."""
    src = tmp_path / "ss"
    src.mkdir()
    events = [
        {"user_id": 1, "value": 10.0},
        {"user_id": 2, "value": 20.0},
        {"user_id": 99, "value": 5.0},  # no dim match
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.format("json")
        .schema("user_id long, value double")
        .load(str(src))
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["user_id"]: r["tier"] for r in spark.sql("select * from enriched").collect()}
    assert rows == {1: "gold", 2: "silver", 99: None}


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch parity with the reference's foreachRDD
    (Prediction_Pipe_Line.py:107) — per-batch arbitrary sink logic,
    but with the model/logic captured ONCE outside the loop."""
    src = tmp_path / "fb"
    src.mkdir()
    (src / "b0.txt").write_text("alpha\nbeta\n")
    stream = spark.readStream.format("text").schema("value string").load(str(src))
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").json(str(out_dir / f"batch_{batch_id}"))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    written = spark.read.json(str(out_dir / "batch_0"))
    assert sorted(r["value"] for r in written.collect()) == ["alpha", "beta"]


def test_socket_source_shape(spark):
    """Socket-source parity (Prediction_Pipe_Line.py:101): unbounded
    (value: string) frame. Construction only — no listener to hit."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        read_socket_lines,
    )

    df = read_socket_lines(spark, "localhost", 65395)
    assert df.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("value", "string")
    ]


def test_processing_time_trigger(spark, tmp_path):
    """Processing-time trigger path (the reference's 30 s cadence,
    configured here at 1 s so the test is fast)."""
    src = tmp_path / "trig"
    src.mkdir()
    (src / "b0.txt").write_text("tick\n")
    stream = spark.readStream.format("text").schema("value string").load(str(src))
    q = (
        stream.writeStream.format("memory")
        .queryName("trig_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck0"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("select * from trig_sink").count() == 1


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop a checkpointed stream, add data, restart from the same
    checkpoint: already-committed batches must not be reprocessed
    (exactly-once file-sink semantics the reference's DStream design
    had no answer for)."""
    src = tmp_path / "ckin"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    (src / "b0.txt").write_text("one\ntwo\n")

    def run_until_drained():
        stream = spark.readStream.format("text").schema("value string").load(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_until_drained()
    (src / "b1.txt").write_text("three\n")
    run_until_drained()  # restart from checkpoint
    rows = sorted(r["value"] for r in spark.read.parquet(sink).collect())
    assert rows == ["one", "three", "two"]  # no duplicates, nothing lost


def test_cross_validated_tuning(spark):
    """CrossValidator grid search (the reference's unused import made
    real). Tiny grid on a separable corpus."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.tune import (
        tune_svm,
    )

    pos = [(f"great amazing wonderful food {i % 7}", 1.0) for i in range(40)]
    neg = [(f"terrible awful rude service {i % 7}", 0.0) for i in range(40)]
    df = spark.createDataFrame(pos + neg, "text string, label double")
    best_model, best_params, metrics = tune_svm(
        df, reg_params=[0.1, 0.3], max_iters=[10], n_folds=2
    )
    assert set(best_params) == {"regParam", "maxIter"}
    assert max(metrics) > 0.9
    preds = best_model.transform(df)
    assert preds.filter(F.col("prediction") != F.col("label")).count() == 0


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join (click attribution): both sides
    are unbounded file streams; the event-time bound + watermark make
    the join state finite. Result must equal the batch join on the
    same data."""
    import datetime as dt

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        stream_stream_click_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def iso(minutes):
        return (t0 + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S")

    purchases = [
        {"event_id": 1, "user_id": 7, "ts": iso(10)},
        {"event_id": 2, "user_id": 7, "ts": iso(30)},
        {"event_id": 3, "user_id": 8, "ts": iso(10)},
    ]
    clicks = [
        {"user_id": 7, "ts": iso(5)},   # → purchase 1 (within 10 min before)
        {"user_id": 7, "ts": iso(9)},   # → purchase 1
        {"user_id": 7, "ts": iso(10)},  # boundary: == p_ts, excluded
        {"user_id": 7, "ts": iso(25)},  # → purchase 2
        {"user_id": 8, "ts": iso(29)},  # wrong user for 2, too late for 3
        {"user_id": 9, "ts": iso(9)},   # no purchase
    ]
    pdir, cdir = tmp_path / "p", tmp_path / "c"
    pdir.mkdir(), cdir.mkdir()
    (pdir / "b0.json").write_text("\n".join(json.dumps(e) for e in purchases))
    (cdir / "b0.json").write_text("\n".join(json.dumps(e) for e in clicks))
    p_schema = "event_id long, user_id long, ts timestamp"
    c_schema = "user_id long, ts timestamp"
    p_stream = spark.readStream.format("json").schema(p_schema).load(str(pdir))
    c_stream = spark.readStream.format("json").schema(c_schema).load(str(cdir))
    joined = stream_stream_click_attribution(p_stream, c_stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["p_event_id"], r["c_ts"].minute)
        for r in spark.sql("select * from attributed").collect()
    )
    assert got == [(1, 5), (1, 9), (2, 25)]
    # batch twin on the same frames agrees
    pb = spark.read.format("json").schema(p_schema).load(str(pdir))
    cb = spark.read.format("json").schema(c_schema).load(str(cdir))
    cond = (
        (pb.user_id == cb.user_id)
        & (cb.ts >= pb.ts - F.expr("INTERVAL 10 MINUTES"))
        & (cb.ts < pb.ts)
    )
    batch = sorted(
        (r["event_id"], r["ts2"].minute)
        for r in pb.join(cb.select(F.col("user_id").alias("u2"), F.col("ts").alias("ts2")),
                         (pb.user_id == F.col("u2"))
                         & (F.col("ts2") >= pb.ts - F.expr("INTERVAL 10 MINUTES"))
                         & (F.col("ts2") < pb.ts))
        .select("event_id", "ts2").collect()
    )
    assert batch == got


def test_c4_line_filter_runs_on_stream(spark, tmp_path):
    """The C4 quality gate (operators/textstats.c4_line_stats) is a
    pure stateless projection, so the SAME operator runs unchanged on
    a readStream — the unified batch/stream contract the engine's
    text-cleaning tier promises. Filter-at-ingest is the 100 TB shape:
    documents rejected here never reach storage or downstream state."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        textstats,
    )

    src = tmp_path / "c4s"
    src.mkdir()
    docs = [
        {"doc_id": 1, "text": "one good line of six words.\n" * 3},
        {"doc_id": 2, "text": "lorem ipsum dolor sit amet here."},
        {"doc_id": 3, "text": "short."},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(d) for d in docs))
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(str(src))
    )
    gated = textstats.c4_line_stats(stream).filter(F.col("keep_doc"))
    q = (
        gated.writeStream.format("memory")
        .queryName("c4_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "c4ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = [r["doc_id"] for r in spark.sql("select * from c4_gate").collect()]
    assert kept == [1]  # doc 2: lorem ipsum; doc 3: <3 kept lines


def test_quality_classifier_scores_stream(spark, tmp_path):
    """The hashed-n-gram quality classifier (ml/quality.py) is a pure
    PipelineModel, so a model trained on batch data scores an unbounded
    stream unchanged — the filter-at-ingest deployment the fastText
    pattern exists for. Stream predictions must match the batch
    transform row-for-row."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.quality import (
        train_quality_classifier,
    )

    train = spark.createDataFrame(
        [(i, "good clean prose with many plain words here today " * 3)
         for i in range(30)]
        + [(i, "### ### ### junk") for i in range(30, 60)],
        "doc_id long, text string",
    )
    model, _ = train_quality_classifier(train, min_tokens=10)

    docs = [
        {"doc_id": 100, "text": "good clean prose with many plain words here today " * 3},
        {"doc_id": 101, "text": "### ### ### junk"},
    ]
    src = tmp_path / "qsrc"
    src.mkdir()
    (src / "b0.json").write_text("\n".join(json.dumps(d) for d in docs))
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(str(src))
    )
    scored = model.transform(stream).select("doc_id", "prediction")
    q = (
        scored.writeStream.format("memory")
        .queryName("q_scores")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "qck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: r["prediction"]
        for r in spark.sql("select * from q_scores").collect()
    }
    assert got == {100: 1.0, 101: 0.0}


def test_hash_sampler_keep_rule_on_stream(spark, tmp_path):
    """The deterministic md5-prefix keep rule (mixture_sample_docs /
    hash_stratified_sample) is a stateless projection, so it runs
    unchanged on a readStream — and because it is hash-derived, the
    streaming decision for any doc equals the batch decision, which is
    what makes ingest-time down-sampling consistent with a later batch
    re-run (no RNG divergence between the two paths)."""
    docs = [{"doc_id": i, "text": f"doc number {i}"} for i in range(40)]
    src = tmp_path / "hsrc"
    src.mkdir()
    (src / "b0.json").write_text("\n".join(json.dumps(d) for d in docs))

    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        / F.lit(4294967296.0)
    )
    rate = 0.5

    batch_df = (
        spark.read.json(str(src), schema="doc_id long, text string")
        .filter(u < rate)
    )
    batch_kept = {r["doc_id"] for r in batch_df.collect()}

    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(str(src))
        .filter(u < rate)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hash_sample")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_kept = {
        r["doc_id"] for r in spark.sql("select * from hash_sample").collect()
    }
    assert stream_kept == batch_kept
    assert 0 < len(stream_kept) < 40  # the rule genuinely splits


def test_stream_upsert_sink_exactly_once_on_replay(spark, tmp_path):
    """End-to-end effectively-exactly-once streaming sink: stream →
    foreachBatch → layout.upsert_into_partitioned. foreachBatch is
    at-least-once under failure (a batch can be re-delivered after a
    crash before the checkpoint commits), so the SINK must be
    idempotent — the keyed version-winning MERGE is exactly that.
    Simulated redelivery: apply the same batch twice; the dataset must
    be byte-identical to a single delivery, and a genuinely newer
    version must still win."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        layout,
    )

    base = tmp_path / "tbl"
    seed = spark.createDataFrame(
        [(1, "d1", "old", 1), (2, "d1", "old", 1), (3, "d2", "old", 1)],
        "id long, day string, payload string, version long",
    )
    seed.write.partitionBy("day").parquet(str(base))

    src = tmp_path / "usrc"
    src.mkdir()
    (src / "b0.json").write_text(
        json.dumps({"id": 2, "day": "d1", "payload": "new", "version": 2})
    )
    stream = (
        spark.readStream.format("json")
        .schema("id long, day string, payload string, version long")
        .load(str(src))
    )

    def sink(batch_df, batch_id: int) -> None:
        # applied TWICE per batch to simulate at-least-once redelivery
        for _ in range(2):
            layout.upsert_into_partitioned(
                spark,
                batch_df,
                str(base),
                key_cols=["id"],
                partition_col="day",
                version_col="version",
            )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "uck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = {
        r["id"]: (r["payload"], r["version"], r["day"])
        for r in spark.read.parquet(str(base)).collect()
    }
    assert rows == {
        1: ("old", 1, "d1"),
        2: ("new", 2, "d1"),   # updated once, despite double apply
        3: ("old", 1, "d2"),   # untouched partition never rewritten
    }


def test_quality_expectations_run_on_stream(spark, tmp_path):
    """The declarative expectation counters are plain conditional
    aggregates, so the same expressions run as a streaming
    aggregation — violations accumulate across micro-batches in
    complete mode (ingest-time data-contract monitoring)."""
    src = tmp_path / "dq"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"o_orderkey": 1, "o_totalprice": 10.0, "o_orderstatus": "O"},
                {"o_orderkey": 2, "o_totalprice": -5.0, "o_orderstatus": "O"},
                {"o_orderkey": 3, "o_totalprice": 7.0, "o_orderstatus": "X"},
            ]
        )
    )
    stream = (
        spark.readStream.format("json")
        .schema("o_orderkey long, o_totalprice double, o_orderstatus string")
        .load(str(src))
    )
    agg = stream.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "v_price_positive"
        ),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("v_status_domain"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("dq_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "dqck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    r = spark.sql("select * from dq_out").collect()[0]
    assert (r["n_rows"], r["v_price_positive"], r["v_status_domain"]) == (3, 1, 1)


def test_rocksdb_state_store_equivalence(spark, tmp_path):
    """Same windowed aggregation under RocksDBStateStoreProvider and the
    default HDFS-backed provider: identical results, and the RocksDB
    run's progress reports the rocksdb provider's custom metrics.
    Providers are per-query (read at .start()), so scoping via
    session.rocksdb_state works with fresh checkpoints."""
    import json

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
        rocksdb_state,
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        windowed_event_counts,
    )

    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        {"ts": f"2024-01-01T0{h}:{m:02d}:00Z", "event_type": t, "value": 1.0}
        for h in range(3)
        for m in (5, 35)
        for t in ("click", "view")
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))

    def run(name, ck):
        stream = (
            spark.readStream.format("json")
            .schema("ts timestamp, event_type string, value double")
            .load(str(src))
        )
        q = (
            windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.processAllAvailable()
        progress = q.lastProgress
        q.stop()
        out = sorted(
            tuple(str(v) for v in r)
            for r in spark.sql(f"select * from {name}").collect()
        )
        return out, progress

    base, _ = run("ssp_default", "ck_default")
    with rocksdb_state(spark, unload_on_commit=True):
        rocks, progress = run("ssp_rocks", "ck_rocks")

    assert base == rocks and len(base) == 6
    custom = progress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in custom), custom
    # conf restored outside the scope
    assert "RocksDB" not in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "HDFSBackedStateStoreProvider",
    )


def test_stream_stream_left_outer_null_padding(spark, tmp_path):
    """Left-outer interval join emits the null-padded row for a
    click-less purchase only after the click-side watermark passes its
    join window — the emission-lag semantics batch left joins lack."""
    import json

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        stream_stream_click_attribution,
    )

    pdir, cdir = tmp_path / "p", tmp_path / "c"
    pdir.mkdir(), cdir.mkdir()

    def iso(minutes):
        return f"2024-01-01T{minutes // 60:02d}:{minutes % 60:02d}:00Z"

    # purchase 1 has a click 5 min before; purchase 2 has NO clicks
    (pdir / "b0.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"event_id": 1, "user_id": 7, "ts": iso(60)},
                {"event_id": 2, "user_id": 8, "ts": iso(60)},
            ]
        )
    )
    (cdir / "b0.json").write_text(
        json.dumps({"user_id": 7, "ts": iso(55)})
    )
    schema_p = "event_id long, user_id long, ts timestamp"
    schema_c = "user_id long, ts timestamp"
    p = spark.readStream.format("json").schema(schema_p).load(str(pdir))
    c = spark.readStream.format("json").schema(schema_c).load(str(cdir))
    joined = stream_stream_click_attribution(
        p, c, watermark="30 minutes", how="left_outer"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sslo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    early = {
        (r["p_event_id"], r["c_ts"] is None)
        for r in spark.sql("select * from sslo").collect()
    }
    # inner match emitted; the outer row for purchase 2 must NOT be
    # out yet — its window could still receive a click
    assert (1, False) in early and not any(e == 2 for e, _ in early)
    # late far-future events push both watermarks past purchase 2's
    # window → the null-padded row flushes
    (pdir / "b1.json").write_text(
        json.dumps({"event_id": 99, "user_id": 1, "ts": iso(600)})
    )
    (cdir / "b1.json").write_text(
        json.dumps({"user_id": 1, "ts": iso(600)})
    )
    q.processAllAvailable()
    # one more empty-ish batch lets the state manager evict + emit
    q.processAllAvailable()
    q.stop()
    final = {
        (r["p_event_id"], r["c_ts"] is None)
        for r in spark.sql("select * from sslo").collect()
    }
    assert (2, True) in final, final
