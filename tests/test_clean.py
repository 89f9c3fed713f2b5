"""Unit tests for cleaning operators — reference-semantics parity on
hand-computed inputs (SURVEY.md §5: known tiny inputs, golden outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    clean,
)


def test_normalize_text_reference_parity(spark):
    # reference: remove_punct + remove_spaces + ltrim
    # (Yelp_Data_PreProcessing.py:116-143)
    rows = [
        (1, "  Great food!!! 5/5 stars\r\n\tWould go again..."),
        (2, "ok."),
        (3, "a  b   c"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r["id"]: r["clean"]
        for r in df.select("id", clean.normalize_text("text").alias("clean")).collect()
    }
    assert out[1] == "Great food stars Would go again"
    assert out[2] == "ok"
    assert out[3] == "a b c"
    assert out[4] == ""


def test_binarize_rating(spark):
    # 1 if stars >= 4 else 0 (Yelp_Data_PreProcessing.py:123-126)
    df = spark.createDataFrame(
        [("5",), ("4",), ("3",), ("1",)], "stars string"
    )
    vals = [
        r["label"]
        for r in df.select(clean.binarize_rating("stars").alias("label")).collect()
    ]
    assert vals == [1, 1, 0, 0]


def test_quarantine_bad_stars(spark):
    # stars>5 mis-parses and junk sentinels dropped
    # (Scalable_EDA_Final.py:322,365; junk 2017 at M:171)
    df = spark.createDataFrame(
        [("5",), ("2017",), ("abc",), ("3",), (None,)], "stars string"
    )
    kept = [r["stars"] for r in clean.quarantine_bad_stars(df).collect()]
    assert sorted(kept) == ["3", "5"]


def test_drop_null_rows_subset(spark):
    # dropna(subset=...) (Yelp_Data_PreProcessing.py:61)
    df = spark.createDataFrame(
        [(1, "t", 0), (2, None, 1), (3, "u", None), (4, "v", 2)],
        "id int, text string, funny int",
    )
    kept = clean.drop_null_rows(df, subset=["text", "funny"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 4]


def test_impute_null_elite(spark):
    # post-left-join elite impute (Scalable_Project_SVM_Model_Deployment.py:81)
    df = spark.createDataFrame([(1, None), (2, 7)], "id int, elite int")
    out = df.select("id", clean.impute_null("elite", 0).alias("elite"))
    assert {r["id"]: r["elite"] for r in out.collect()} == {1: 0, 2: 7}


def test_web_text_clean_pipeline(spark):
    """HTML tags, URLs, emails and phone numbers all cleaned in one
    codegen'd pass."""
    rows = [
        (1, '<p>Visit https://example.com/x?y=1 or www.foo.org now</p>'),
        (2, "mail me at john.doe+spam@example.co.uk or call +1 (555) 123-4567"),
        (3, "plain text stays untouched"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r["t"] for r in df.select("id", clean.web_text_clean("text").alias("t")).collect()}
    assert out[1] == "Visit or now"
    assert out[2] == "mail me at <EMAIL> or call <PHONE>"
    assert out[3] == "plain text stays untouched"


def test_stem_light_rules(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.functions.text import (
        stem_light,
    )

    rows = [("glasses",), ("stories",), ("cats",), ("pass",), ("hoping",),
            ("rated",), ("running",), ("table",)]
    df = spark.createDataFrame(rows, "w string")
    out = [r["s"] for r in df.select(stem_light("w").alias("s")).collect()]
    #        sses→ss   ies→i    s-drop  ss kept  vowel+ing  vowel+ed  cons+ing  unchanged
    assert out == ["glass", "stori", "cat", "pass", "hop", "rat", "running", "table"]


def test_clean_stage_stays_in_codegen(spark):
    """The cleaning chain must not introduce a BatchEvalPython boundary
    (the reference's UDF anti-pattern, SURVEY.md §4.1)."""
    df = spark.createDataFrame([(1, "x!")], "id int, text string")
    plan = (
        df.select(clean.normalize_text("text").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_phone_pattern_is_digit_dense(spark):
    """r11 review: the old char-class phone pattern matched any
    9+-char span holding just TWO digits, masking version strings and
    sparse digit runs corpus-wide. The rebuilt pattern needs >= 7
    digits with at most one separator between each pair; digit-dense
    date shapes still mask (dates of birth ARE PII — the conservative
    stance this pipeline takes)."""
    rows = spark.createDataFrame(
        [
            (1, "call +1 (555) 123-4567 now"),     # real phone: masked
            (2, "version 1.2.3.4.5 released"),     # 5 digits: kept
            (3, "a 1------2 ladder"),              # sparse: kept
            (4, "born 2020-08-16 here"),           # digit-dense: masked
            (5, "call 555 - 123 - 4567 now"),      # spaced-dash phone: masked
            (6, "list 1 - 2 - 3 - 4 - 5 - 6 - 7 end"),  # spaced list: kept
            (7, "ring +44 - 20 - 7946 - 0958 uk"),  # wide 4-group intl: masked
            (8, "steps 1 - 22 - 3 - 44 - 5 - 66 - 7 mix"),  # 1-digit gaps: kept
        ],
        "id int, text string",
    )
    from pyspark.sql import functions as F

    out = {
        r["id"]: r["m"]
        for r in rows.select(
            "id", clean.mask_pii(F.col("text")).alias("m")
        ).collect()
    }
    assert "<PHONE>" in out[1]
    assert out[2] == "version 1.2.3.4.5 released"
    assert out[3] == "a 1------2 ladder"
    assert "<PHONE>" in out[4]
    assert "<PHONE>" in out[5]
    assert out[6] == "list 1 - 2 - 3 - 4 - 5 - 6 - 7 end"
    assert "<PHONE>" in out[7]
    assert out[8] == "steps 1 - 22 - 3 - 44 - 5 - 66 - 7 mix"


def test_binarize_rating_null_precondition_documented(spark):
    """NULL/unparseable stars fall to label 0 — reference parity,
    kept; the docstring requires the quarantine stage first. This test
    pins the parity behavior so a silent change surfaces."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("5",), ("3",), (None,), ("abc",)], "stars string"
    )
    out = [
        r["label"]
        for r in df.select(
            clean.binarize_rating(F.col("stars")).alias("label")
        ).collect()
    ]
    assert out == [1, 0, 0, 0]
