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
