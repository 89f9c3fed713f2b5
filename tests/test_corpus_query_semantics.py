"""Semantic unit tests for the corpus-pipeline queries added in this
tier — hand-checked invariants on seeded fixtures, independent of the
DuckDB oracle equivalence (which checks cross-engine agreement, not
that the semantics themselves are right)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans import (
    queries as Q,
)

from .conftest import SF_DIR_CORRECTNESS


# ---------------------------------------------------------------------------
# sentence_chunks


def test_sentence_chunks_respect_budget_boundaries(spark):
    """A chunk starts exactly when the previous sentences crossed a
    64-token boundary; sentences are never split across chunks, so a
    chunk may OVERSHOOT 64 tokens but only via its final sentence."""
    df = Q.q_sentence_chunks(spark, SF_DIR_CORRECTNESS)
    rows = df.collect()
    assert rows
    # chunk ids per doc are dense from 0 when each chunk holds >= 1 sentence
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        ids = sorted(c["chunk_id"] for c in chunks)
        assert ids[0] == 0, f"doc {doc_id} first chunk_id {ids[0]}"
        for c in chunks:
            assert c["n_sentences"] >= 1
            assert c["n_tokens"] >= 1


def test_sentence_chunks_match_sentence_stats_totals(spark):
    """Chunking must conserve sentences: per-doc sentence counts agree
    with the independent q_sentence_stats segmentation."""
    chunks = (
        Q.q_sentence_chunks(spark, SF_DIR_CORRECTNESS)
        .groupBy("doc_id")
        .agg(F.sum("n_sentences").alias("n"))
    )
    stats = Q.q_sentence_stats(spark, SF_DIR_CORRECTNESS).select(
        "doc_id", F.col("n_sentences").alias("m")
    )
    joined = chunks.join(stats, "doc_id", "full")
    bad = joined.filter(
        F.col("n").isNull() | F.col("m").isNull() | (F.col("n") != F.col("m"))
    ).count()
    assert bad == 0


def test_sentence_chunk_assignment_formula(spark):
    """Fixture doc: sentences of 3/2/60/10 tokens with budget 64 →
    cumulative-before = 0,3,5,65 → chunks 0,0,0,1."""
    text = " ".join(
        [
            "a b c.",
            "d e.",
            " ".join(f"t{i}" for i in range(60)) + ".",
            " ".join(f"u{i}" for i in range(10)) + ".",
        ]
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, text, "en", "srcX", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            (r["chunk_id"]): (r["n_sentences"], r["n_tokens"])
            for r in Q.q_sentence_chunks(spark, td).collect()
        }
    assert out == {0: (3, 65), 1: (1, 10)}


# ---------------------------------------------------------------------------
# gopher_quality_rules


def _gopher_one(spark, text: str):
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, text, "en", "srcX", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        [r] = Q.q_gopher_quality_rules(spark, td).collect()
    return r


def test_gopher_rules_clean_doc_passes(spark):
    r = _gopher_one(spark, "the quick brown fox jumps over the lazy dog today")
    assert (
        r["n_pass_wordcount"],
        r["n_pass_alpha"],
        r["n_pass_symbols"],
        r["n_pass_all"],
    ) == (1, 1, 1, 1)


def test_gopher_rules_too_short_fails_wordcount_only(spark):
    r = _gopher_one(spark, "too short here")  # 3 tokens < 5
    assert r["n_pass_wordcount"] == 0
    assert r["n_pass_alpha"] == 1
    assert r["n_pass_all"] == 0


def test_gopher_rules_numeric_soup_fails_alpha(spark):
    r = _gopher_one(spark, "12 34 56 78 90 11 22 33 44 55")
    assert r["n_pass_alpha"] == 0
    assert r["n_pass_wordcount"] == 1


def test_gopher_rules_hash_spam_fails_symbols(spark):
    # 10 '#' in 20 chars >> 2% symbol budget
    r = _gopher_one(spark, "ab ## ## ## ## ## cd")
    assert r["n_pass_symbols"] == 0


# ---------------------------------------------------------------------------
# hash_stratified_sample / deterministic properties


def test_stratified_sample_is_deterministic(spark):
    a = {
        r["lang"]: (r["n_docs"], r["n_kept"])
        for r in Q.q_hash_stratified_sample(spark, SF_DIR_CORRECTNESS).collect()
    }
    b = {
        r["lang"]: (r["n_docs"], r["n_kept"])
        for r in Q.q_hash_stratified_sample(spark, SF_DIR_CORRECTNESS).collect()
    }
    assert a == b
    # en is down-sampled harder than every other stratum
    en_rate = a["en"][1] / a["en"][0]
    for lang, (n, k) in a.items():
        if lang != "en" and n >= 20:
            assert k / n > en_rate


# ---------------------------------------------------------------------------
# winsorized_value_stats


def test_winsorized_clip_counts_bounded_by_5pct(spark):
    """With exact interpolated percentiles, at most ~5% of rows can lie
    strictly outside each band edge."""
    for r in Q.q_winsorized_value_stats(spark, SF_DIR_CORRECTNESS).collect():
        n = r["n_events"]
        assert r["p05"] <= r["p95"]
        assert r["n_clipped_low"] <= n * 0.05 + 1
        assert r["n_clipped_high"] <= n * 0.05 + 1


# ---------------------------------------------------------------------------
# repeated_ngram_fraction


def test_repeated_ngram_fraction_boilerplate_vs_unique(spark):
    import os
    import tempfile

    rows = [
        (1, "spam spam spam spam spam spam", "en", "s", 29),
        (2, "one two three four five six", "en", "s", 27),
        (3, "single", "en", "s", 6),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r["doc_id"]: r for r in Q.q_repeated_ngram_fraction(spark, td).collect()
        }
    # 5 bigrams, all "spam spam" → 4/5 are repeats
    assert got[1]["n_bigrams"] == 5
    assert abs(got[1]["dup_bigram_frac"] - 0.8) < 1e-9
    # all distinct → 0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["dup_trigram_frac"] == 0.0
    # no bigrams at all → defined as 0
    assert got[3]["n_bigrams"] == 0
    assert got[3]["dup_bigram_frac"] == 0.0


# ---------------------------------------------------------------------------
# pii_redaction_stats


def test_pii_counts_on_fixture(spark):
    import os
    import tempfile

    text = (
        "contact me at someone@example.com or +1 (555) 123-4567, "
        "see https://example.com/x and <b>bold</b> twice: a@b.io"
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        [r] = Q.q_pii_redaction_stats(spark, td).collect()
    assert r["n_emails"] == 2
    assert r["n_urls"] == 1
    assert r["n_phones"] == 1
    assert r["n_html_tags"] == 2
    assert r["n_docs_affected"] == 1


# ---------------------------------------------------------------------------
# TPC-H shape sanity


def test_top_supplier_revenue_is_argmax(spark):
    best = Q.q_top_supplier_revenue(spark, SF_DIR_CORRECTNESS).collect()
    assert len(best) >= 1
    # every returned supplier carries the same (maximum) revenue
    revs = {r["total_revenue"] for r in best}
    assert len(revs) == 1


def test_important_parts_share_threshold(spark):
    df = Q.q_important_parts_share(spark, SF_DIR_CORRECTNESS)
    rows = df.collect()
    assert rows
    total = sum(r["part_value"] for r in rows)
    # each surviving part individually exceeds 1/2000 of the group total,
    # so the survivors' combined share must exceed n/2000 of it
    assert all(r["part_value"] > 0 for r in rows)
    vals = [r["part_value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert total > 0


def test_market_share_sums_to_one_denominator(spark):
    for r in Q.q_market_share_region(spark, SF_DIR_CORRECTNESS).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["nation5_revenue"] <= r["total_revenue"] + 1e-6


# ---------------------------------------------------------------------------
# resample_fill_events


def test_resample_spine_is_dense_and_ffilled(spark):
    rows = Q.q_resample_fill_events(spark, SF_DIR_CORRECTNESS).collect()
    assert rows
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour_start"])
        # dense hourly spine: consecutive rows are exactly 1h apart
        for a, b in zip(rs, rs[1:]):
            assert (b["hour_start"] - a["hour_start"]).total_seconds() == 3600
        # first spine hour has data by construction (min-hour)
        assert rs[0]["n_events"] > 0
        assert rs[0]["avg_value_ffill"] is not None
        # gap rows are zero-count but still carry a forward-filled value
        gaps = [r for r in rs if r["n_events"] == 0]
        for g in gaps:
            assert g["avg_value_ffill"] is not None


def test_shapley_attribution_efficiency_axiom(spark):
    """Shapley's efficiency axiom: the channel values must sum to
    v(full) − v(∅) — total conversions minus conversions of users
    with NO pre-purchase channel exposure — computed here by an
    independent two-aggregate replay."""
    out = {
        r["channel"]: r["shapley_conversions"]
        for r in Q.q_shapley_channel_attribution(
            spark, SF_DIR_CORRECTNESS
        ).collect()
    }
    assert set(out) == {"click", "error", "signup", "view"}

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
        load_events,
    )

    ev = load_events(spark, SF_DIR_CORRECTNESS)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    fp = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    users = (
        ev.select(
            "user_id",
            fp.alias("fp"),
            F.when(fp.isNull() | (F.col("ts") < fp), bit)
            .otherwise(0)
            .alias("bit"),
        )
        .groupBy("user_id")
        .agg(
            F.bit_or("bit").alias("mask"),
            F.max(F.col("fp").isNotNull().cast("int")).alias("conv"),
        )
    )
    row = users.agg(
        F.sum("conv").alias("v_full"),
        F.sum(F.when(F.col("mask") == 0, F.col("conv")).otherwise(0)).alias(
            "v_empty"
        ),
    ).collect()[0]
    assert abs(sum(out.values()) - (row["v_full"] - row["v_empty"])) < 1e-6


def test_marketing_report_example_composes(spark):
    """examples/marketing_analytics.py: all eight readouts plan and
    return rows at sf0.001 from one session (the example's contract —
    lazily planned, nothing collected inside the builder)."""
    from examples.marketing_analytics import build_marketing_report

    report = build_marketing_report(spark, "/root/testdata/sf0.001")
    assert set(report) == {
        "funnel", "cohort", "rfm", "shapley", "markov_removal",
        "paths", "ab_t_test", "ab_auc",
    }
    for name, df in report.items():
        assert df.limit(1).count() >= 0, name
    # note: the t-test (means) and AUC (ranks) legitimately CAN
    # disagree in direction on skewed data — at sf0.001 they do
    # (mean_diff < 0 with AUC slightly > 0.5), which is exactly why a
    # growth team runs both; assert only well-formedness here
    t = report["ab_t_test"].collect()[0]
    auc = report["ab_auc"].collect()[0]["auc"]
    assert t["welch_df"] > 1 and 0.0 <= auc <= 1.0
