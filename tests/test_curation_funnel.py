"""Curation-funnel composition: the boilerplate-line stage must
actually strip repeated lines and drop all-boilerplate docs, with the
Spark plan agreeing with the SQL oracle ON A CORPUS WHERE THE STAGE IS
ACTIVE (the parquet fixtures are single-line unique-text docs, so the
stage is a no-op there — these tests are what prove the composition)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


FOOTER = "Visit our   site | All Rights Reserved"
# normalized form of FOOTER appears in >= 3 docs -> boilerplate

ROWS = [
    # doc 0: content + footer -> footer stripped, doc survives
    (0, "src0", "alpha beta gamma delta\n" + FOOTER),
    # doc 1: content + footer (different whitespace in footer: the
    # normalization must still collapse it onto the same line hash)
    (1, "src0", "epsilon zeta eta theta iota\nVisit our site | all rights reserved"),
    # doc 2: ONLY the footer -> no clean lines, drops at boilerplate
    (2, "src1", FOOTER),
    # doc 3: exact dup of doc 0 -> removed at dedup, its footer copy
    # must NOT inflate the line document frequency
    (3, "src1", "alpha beta gamma delta\n" + FOOTER),
    # doc 4: unique two-line doc, untouched
    (4, "src1", "kappa lambda mu\nnu xi omicron pi"),
    # doc 5: footer + unique line
    (5, "src2", FOOTER + "\nrho sigma tau upsilon phi"),
    # doc 6: empty-ish doc (whitespace only) -> no lines at all
    (6, "src2", "   \n  "),
]


def _result_via_spark(spark, monkeypatch_docs):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans import (
        queries,
    )

    df = spark.createDataFrame(ROWS, "doc_id long, source string, text string")
    orig = queries._t

    def fake_t(spark_, sf_dir_, name):
        if name == "documents":
            return df
        return orig(spark_, sf_dir_, name)

    queries._t, bak = fake_t, orig
    try:
        out = queries.q_curation_funnel(spark, "unused").collect()
    finally:
        queries._t = bak
    return {r["source"]: r.asDict() for r in out}


def _result_via_duckdb():
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        SQL_CURATION_FUNNEL,
    )

    con = duckdb.connect()
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "source", "text"])
    con.register("documents", pdf)
    cur = con.execute(SQL_CURATION_FUNNEL)
    cols = [d[0] for d in cur.description]
    return {r[cols.index("source")]: dict(zip(cols, r)) for r in cur.fetchall()}


def test_boilerplate_stage_strips_and_drops(spark):
    got = _result_via_spark(spark, None)
    # src0: 2 raw, both canonical, both survive boilerplate; footer
    # lines stripped so tokens = clean-line tokens only
    assert got["src0"]["n_raw"] == 2
    assert got["src0"]["n_after_dedup"] == 2
    assert got["src0"]["n_after_boilerplate"] == 2
    # src1: doc 3 dies at dedup; doc 2 (pure footer) dies at
    # boilerplate; doc 4 survives
    assert got["src1"]["n_raw"] == 2 + 1  # docs 2, 3, 4
    assert got["src1"]["n_after_dedup"] == 2  # docs 2, 4
    assert got["src1"]["n_after_boilerplate"] == 1  # doc 4 only
    # src2: doc 6 (whitespace only) has no lines -> dies at boilerplate
    assert got["src2"]["n_after_dedup"] == 2
    assert got["src2"]["n_after_boilerplate"] == 1  # doc 5 only


def test_clean_token_counts_exclude_boilerplate(spark):
    got = _result_via_spark(spark, None)
    # src0 quality/clean tokens: doc0 "alpha beta gamma delta" = 4,
    # doc1 "epsilon zeta eta theta iota" = 5 (footer stripped in both)
    q0 = got["src0"]
    assert q0["tokens_final"] <= 4 + 5  # never counts footer tokens
    # src2 doc5 clean line "rho sigma tau upsilon phi" = 5 tokens max
    assert got["src2"]["tokens_final"] <= 5


def test_funnel_matches_duckdb_twin_on_active_corpus(spark):
    got = _result_via_spark(spark, None)
    want = _result_via_duckdb()
    assert set(got) == set(want)
    for src in got:
        g, w = got[src], want[src]
        for k in (
            "n_raw",
            "n_after_dedup",
            "n_after_boilerplate",
            "n_after_quality",
            "tokens_final",
        ):
            assert g[k] == w[k], (src, k, g[k], w[k])
        if w["final_share"] is None:
            assert g["final_share"] is None  # 0-token corpus: NULL share
        else:
            assert g["final_share"] == pytest.approx(
                float(w["final_share"]), abs=1e-6
            )
