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


def test_byte_histogram_features(spark):
    """REAL feature extraction (no stub): L1-normalized byte histogram
    with known expected bins; output plugs into the similarity ops."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, ""), (3, "ab")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_byte_histogram_features(
            multimodal.to_binary_docs(docs), n_bins=64
        ).collect()
    }
    assert all(len(v) == 64 for v in out.values())
    # 'a' = 97 → bin 97//4 = 24; all mass in one bin
    assert out[1][24] == pytest.approx(1.0)
    assert sum(out[1]) == pytest.approx(1.0)
    # empty payload → zero vector (no NaN)
    assert out[2] == [0.0] * 64
    # 'a'(97)→24, 'b'(98)→24 (same bin at 64 bins): both in bin 24
    assert out[3][24] == pytest.approx(1.0)


def test_byte_histogram_feeds_similarity(spark):
    """Closing the loop: binary → features → cosine top-k, all engine
    operators."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        similarity,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb"), (2, "aaab bbba"), (3, "zzzz yyyy")],
        "doc_id long, text string",
    )
    feats = multimodal.extract_byte_histogram_features(
        multimodal.to_binary_docs(docs)
    ).select(F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding"))
    out = similarity.cosine_topk_bruteforce(
        feats, feats.filter(F.col("vec_id") == 1), k=1
    ).collect()
    # doc 2 (anagram-ish bytes) is nearer to doc 1 than doc 3
    assert out[0]["neighbor_id"] == 2


def test_resize_stub_schema_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 5000), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_image_stub(
            multimodal.to_binary_docs(docs), target_width=8, target_height=4
        ).collect()
    }
    assert out[1]["n_bytes"] == 32 and len(bytes(out[1]["payload"])) == 32
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    assert bytes(out[1]["payload"]) == b"x" * 32  # nearest-neighbor of constant
    assert out[2]["n_bytes"] == 0 and bytes(out[2]["payload"]) == b""


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


def test_native_header_parsers_on_real_bytes(spark):
    """png_dims/gif_dims must read dimensions out of GENUINE file
    bytes with zero Python workers: the canonical 1x1 transparent PNG
    (public constant) and a 37x21 GIF89a header built to spec
    (little-endian uint16 logical-screen size)."""
    import base64

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.multimodal import (
        gif_dims,
        is_png,
        png_dims,
    )

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
        "2mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    gif_37x21 = b"GIF89a" + (37).to_bytes(2, "little") + (21).to_bytes(
        2, "little"
    ) + b"\xf7\x00\x00"
    df = spark.createDataFrame(
        [(1, bytearray(png_1x1)), (2, bytearray(gif_37x21))],
        "doc_id long, payload binary",
    )
    pw, ph = png_dims("payload")
    gw, gh = gif_dims("payload")
    from pyspark.sql import functions as F

    rows = {
        r["doc_id"]: (r["is_png"], r["w"], r["h"])
        for r in df.select(
            "doc_id",
            is_png("payload").alias("is_png"),
            F.when(is_png("payload"), pw).otherwise(gw).alias("w"),
            F.when(is_png("payload"), ph).otherwise(gh).alias("h"),
        ).collect()
    }
    assert rows == {1: (True, 1, 1), 2: (False, 37, 21)}
