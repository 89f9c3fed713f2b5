"""Schema-evolution ingestion: parquet batches written under drifting
schemas must read back as one stable, typed frame."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
    read_parquet_evolved,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _write_batches(spark, root: str) -> None:
    # vintage 1: before lang/score existed
    spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, text string").write.parquet(
        os.path.join(root, "b1")
    )
    # vintage 2: lang added, score as INT
    spark.createDataFrame(
        [(3, "gamma", "en", 7)], "id long, text string, lang string, score int"
    ).write.parquet(os.path.join(root, "b2"))
    # vintage 3: score widened to LONG, an extra column snuck in
    spark.createDataFrame(
        [(4, "delta", "fr", 9, "junk")],
        "id long, text string, lang string, score long, scratch string",
    ).write.parquet(os.path.join(root, "b3"))


def test_evolved_read_normalizes_to_target(spark, tmp_path):
    root = str(tmp_path / "lake")
    _write_batches(spark, root)
    df = read_parquet_evolved(spark, root + "/*", target_schema=TARGET)
    assert [f.name for f in df.schema.fields] == ["id", "text", "lang", "score"]
    assert dict(df.dtypes)["score"] == "bigint"
    rows = {r["id"]: (r["lang"], r["score"]) for r in df.collect()}
    assert rows == {1: (None, None), 2: (None, None), 3: ("en", 7), 4: ("fr", 9)}


def test_evolved_read_without_target_unions_footers(spark, tmp_path):
    # discovery mode handles column ADDS; conflicting types are refused
    # by Spark (CANNOT_MERGE_SCHEMAS) — that's the documented contract,
    # covered in the test below
    root = str(tmp_path / "lake2")
    spark.createDataFrame([(1, "alpha")], "id long, text string").write.parquet(
        os.path.join(root, "b1")
    )
    spark.createDataFrame(
        [(3, "gamma", "en")], "id long, text string, lang string"
    ).write.parquet(os.path.join(root, "b2"))
    df = read_parquet_evolved(spark, root + "/*")
    names = {f.name for f in df.schema.fields}
    assert {"id", "text", "lang"} <= names
    assert df.count() == 2


def test_discovery_mode_refuses_type_conflicts(spark, tmp_path):
    import pytest as _pytest

    root = str(tmp_path / "lake4")
    _write_batches(spark, root)
    with _pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        read_parquet_evolved(spark, root + "/*").collect()


def test_evolved_read_survives_downstream_agg(spark, tmp_path):
    root = str(tmp_path / "lake3")
    _write_batches(spark, root)
    df = read_parquet_evolved(spark, root + "/*", target_schema=TARGET)
    out = df.agg(
        F.count("*").alias("n"), F.sum("score").alias("s")
    ).collect()[0]
    assert (out["n"], out["s"]) == (4, 16)


# ---------------------------------------------------------------------------
# JSON-lines ingestion (same quarantine contract as CSV)


def test_read_jsonl_quarantines_bad_lines(spark, tmp_path):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
        read_jsonl,
        split_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "good line"}\n'
        "this is not json at all\n"
        '{"id": 2, "text": "another"}\n'
        '{"id": "NOT_A_NUMBER", "text": "type mismatch"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = read_jsonl(spark, str(p), schema)
    clean, bad = split_quarantine(df)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    assert bad.count() == 2  # junk line + type-mismatch line
    # corrupt payloads preserved verbatim for audit
    payloads = [r["_corrupt_record"] for r in bad.collect()]
    assert any("not json" in p for p in payloads)
