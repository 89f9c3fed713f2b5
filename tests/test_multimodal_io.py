"""Multimodal plumbing + schema-enforced IO tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    multimodal,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.schemas import (
    YELP_REVIEW,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
    read_csv,
    split_quarantine,
)


def test_to_binary_docs_schema(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = multimodal.to_binary_docs(docs)
    row = out.collect()[0]
    assert bytes(row["payload"]) == b"hello world"
    assert row["mime"] == "text/plain"
    assert row["n_bytes"] == 11


def test_decode_image_meta_deterministic(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = multimodal.decode_image_meta(multimodal.to_binary_docs(docs)).collect()[0]
    import hashlib

    assert out["header_hash"] == hashlib.md5(b"hello world").hexdigest()
    assert out["fake_width"] == 1 + ord("h") % 64
    assert out["fake_height"] == 1 + ord("d") % 64


def test_decode_image_real_is_stubbed(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(multimodal.to_binary_docs(docs))


def test_frame_sample_fanout(spark):
    docs = spark.createDataFrame(
        [(1, "0123456789" * 5)], "doc_id long, text string"
    )
    frames = multimodal.frame_sample_stub(
        multimodal.to_binary_docs(docs), every_n=10
    ).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert bytes(frames[0]["frame"]) == b"0123456789"


def test_write_csv_header_roundtrip(spark, tmp_path):
    """write_csv actually writes the header (the reference's
    option('head') typo silently produced headerless files,
    Yelp_Data_PreProcessing.py:158)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
        write_csv,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    back = spark.read.option("header", True).schema("id int, name string").csv(path)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_rolling_fingerprint_sketch_properties(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.textstats import (
        rolling_fingerprint_sketch,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat tonight"),  # near dup
        (4, "completely different content with no overlap at all!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in rolling_fingerprint_sketch(df).collect()}
    assert out[1]["sketch_hash"] == out[2]["sketch_hash"]  # exact dup key
    s1, s3, s4 = (set(out[i]["sketch"]) for i in (1, 3, 4))
    assert len(s1 & s3) > len(s1 & s4)  # near-dup shares more sketch


def test_csv_quarantine_catches_malformed_rows(spark, tmp_path):
    """Truly malformed rows (wrong arity, broken quoting) land in the
    quarantine with the RAW record preserved for audit — the failure
    mode the reference silently mis-parsed into stars>5 garbage
    (SURVEY.md §1.3)."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "review_id,user_id,business_id,stars,date,text,useful,funny,cool\n"
        "r1,u1,b1,5,2020-01-01,good,1,0,0\n"
        "r2,u2\n"
        'r3,u3,b3,4,2020-01-02,"unclosed quote,1,0,0\n'
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.schemas import (
        YELP_REVIEW,
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
        read_csv,
        split_quarantine,
    )

    clean, bad = split_quarantine(
        read_csv(spark, str(p), YELP_REVIEW, multi_line=False)
    )
    assert clean.count() == 1
    raw = sorted(r["_corrupt_record"] for r in bad.collect())
    assert raw == ["r2,u2", 'r3,u3,b3,4,2020-01-02,"unclosed quote,1,0,0']


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink (second columnar format besides parquet)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / "orc_out")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, {"a": 2})], "id long, payload map<string,int>")
    path = str(tmp_path / "json_out")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id long, payload map<string,int>").json(path)
    row = back.collect()[0]
    assert row["id"] == 1 and row["payload"]["a"] == 2


def test_rate_source_produces_rows(spark, tmp_path):
    """Rate source (deterministic-cadence synthetic stream)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("select * from rate_sink").columns == ["timestamp", "value"]


def test_csv_quarantine(spark, tmp_path):
    """PERMISSIVE CSV: malformed rows land in _corrupt_record instead of
    silently poisoning downstream casts (SURVEY.md §1.3)."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "review_id,user_id,business_id,stars,date,text,useful,funny,cool\n"
        'r1,u1,b1,5,2020-01-01,"good food",1,0,0\n'
        "r2,u2,b2,4,2020-01-02,ok,2,1,1\n"
    )
    df = read_csv(spark, str(p), YELP_REVIEW, multi_line=False)
    clean, bad = split_quarantine(df)
    assert clean.count() == 2
    assert bad.count() == 0
    assert clean.filter(F.col("stars") == "5").count() == 1
