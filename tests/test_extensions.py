"""UDTF + UDAF extension surface: equivalence vs native twins.

SURVEY.md §2.8: the reference has no UDAFs/UDTFs; these are the uplift
extension points, each proven equal to the codegen-native twin it
should be traded against.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.functions.extensions import (
    geometric_mean_native,
    geometric_mean_udaf,
    register_extensions,
    split_sentences_native,
)

DOCS = [
    (1, "First point. Second point!  Third?"),
    (2, "One sentence only"),
    (3, ""),
    (4, None),
]


def test_udtf_matches_native_split(spark):
    register_extensions(spark)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("ext_docs")
    via_udtf = {
        (r["doc_id"], r["pos"], r["sentence"])
        for r in spark.sql(
            "SELECT d.doc_id, s.pos, s.sentence "
            "FROM ext_docs d, LATERAL split_sentences(d.text) s"
        ).collect()
    }
    via_native = {
        (r["doc_id"], r["pos"], r["sentence"])
        for r in split_sentences_native(df).select(
            "doc_id", "pos", "sentence"
        ).collect()
    }
    assert via_udtf == via_native
    assert (1, 2, "Third?") in via_udtf and (2, 0, "One sentence only") in via_udtf
    # empty/null docs emit nothing from either path
    assert not any(d in (3, 4) for d, _, _ in via_udtf)


def test_udaf_matches_native_geometric_mean(spark):
    df = spark.range(300).select(
        (F.col("id") % 3).alias("grp"),
        (F.col("id") % 7 + 1).cast("double").alias("v"),
    )
    gm = geometric_mean_udaf()
    got = {
        r["grp"]: r["gm"]
        for r in df.groupBy("grp").agg(gm("v").alias("gm")).collect()
    }
    want = {
        r["grp"]: r["gm"]
        for r in df.groupBy("grp")
        .agg(geometric_mean_native("v").alias("gm"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
