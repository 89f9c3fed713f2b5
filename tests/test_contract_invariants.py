"""Driver-contract invariants: the properties the correctness gate
assumes about the registries themselves."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_registry_shapes():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 60
    assert set(osql) <= set(qs), "oracle without a query"
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_rows_only_set_is_intentional():
    """Every query without an oracle must be one of the documented
    non-SQL-expressible families (LSH/hash internals, ML internals,
    grouped dense math)."""
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    rows_only = set(qs) - set(osql)
    allowed = {
        # seeded-RNG hash families / ml internals with no portable
        # SQL replay; each has a recall- or property-test twin.
        # r13 promoted dedup_minhash_lsh (murmur3-in-SQL completed the
        # HashingTF -> MinHashLSH replay) and similarity_ann_lsh (BRP
        # buckets + sequential sqdist chain) out of this set — the
        # r13 (late): dedup_minhash_native promoted too — the XXH64
        # split-multiply SQL replay (_xxh_string_hash_ctes) closed the
        # "no reasonable SQL replay" objection
        "similarity_ivf",
        "embedding_pca_by_label",
        # round 3 promoted ml_tfidf_features / ml_train_f1 /
        # pagerank_purchase_graph / dedup_simhash out of this set
        # (real oracles now); similarity_ivf keeps its ml.KMeans
        # variant rows-only with similarity_ivf_kmeans as the
        # oracle-backed twin
        # r4: approx_percentile sketch internals aren't portable SQL;
        # tolerance-tested against the exact oracle-backed twin in
        # tests/test_approx_quantiles.py
        "winsorized_value_stats_approx",
        # r7: PQ/ADC ANN — subspace-codebook internals (seeded k-means
        # per subspace) have no portable SQL replay; differential numpy
        # twin + recall floor in tests/test_dedup_similarity.py
        "similarity_pq_adc",
        # r7: blocked ALS factorization — seeded-iterative, no SQL
        # replay; RMSE-floor + determinism tests in
        # tests/test_recommend.py
        "als_recommendations",
    }
    assert rows_only == allowed, rows_only ^ allowed


def test_grading_window_is_fully_oracle_backed():
    """The driver grades a 50-key prefix of the registry; every key in
    that window must carry a value-hash oracle (a rows-only query in
    the window would waste a graded slot on a weaker check)."""
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    window = list(qs)[:50]
    missing = [k for k in window if k not in osql]
    assert not missing, f"rows-only queries inside the window: {missing}"


def test_queries_are_fresh_callables():
    """queries() must return a fresh dict (driver may mutate it)."""
    a = entry_mod.queries()
    a.clear()
    assert len(entry_mod.queries()) >= 60


def test_observe_query_rerunnable_no_session_registration(spark):
    """The string-form observe() must leave NOTHING registered on the
    session: the query is re-runnable in one session (the Observation
    helper raises REUSE_OBSERVATION / poisons later streaming closures
    with a non-serializable ObservationManager — the bench regression
    this pins). Both runs must agree and carry a CollectMetrics node."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    from .conftest import SF_DIR_CORRECTNESS

    a = QUERIES["observe_scan_metrics"](spark, SF_DIR_CORRECTNESS).collect()
    b = QUERIES["observe_scan_metrics"](spark, SF_DIR_CORRECTNESS).collect()
    assert a == b and a[0]["n_rows"] > 0


def test_salted_join_rejects_outer(spark):
    """The dim side is exploded across all salts, so right/full joins
    would duplicate unmatched dim rows salt_buckets times — rejected."""
    import pytest
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        salted_join,
    )

    fact = spark.createDataFrame([(1, "f")], "k long, a string")
    dim = spark.createDataFrame([(1, "d"), (2, "e")], "k long, b string")
    with pytest.raises(ValueError, match="inner/left only"):
        salted_join(fact, dim, "k", how="right")
    got = salted_join(fact, dim, "k", salt_buckets=4).collect()
    assert len(got) == 1


def test_histogram_zero_fills_empty_buckets(spark):
    """RDD.histogram parity: one count per bin, gaps zero-filled."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        histogram,
    )

    df = spark.createDataFrame(
        [(0.0,), (0.1,), (9.9,), (10.0,), (None,)], "v double"
    )
    got = [(r["bucket"], r["count"]) for r in histogram(df, "v", 10).collect()]
    assert got == [(0, 2)] + [(b, 0) for b in range(1, 9)] + [(9, 2)], got


def test_asof_join_ignores_null_ts_right_rows(spark):
    """A right row with NULL ts must never match (ASOF semantics)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        asof_join,
    )

    left = spark.createDataFrame([(1, 1, "L")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, None, 9.0), (1, 5, 7.0)], "k long, ts long, value double"
    )
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["value"]).collect()
    assert len(out) == 1
    assert out[0]["right_value"] is None and out[0]["matched_ts"] is None


def test_rollup_stats_null_values_match_sql_avg(spark):
    """avg/var derive from the NON-NULL count: a (10.0, NULL) group
    must report avg 10.0 / var 0.0 like SQL AVG/VAR_POP, not 5.0/25.0."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        mergeable_rollup,
        rollup_stats,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (2, None)], "g long, v double"
    )
    got = {
        r["g"]: (r["n"], r["avg_v"], r["var_v"])
        for r in rollup_stats(mergeable_rollup(df, ["g"], "v")).collect()
    }
    assert got[1] == (2, 10.0, 0.0)
    assert got[2][0] == 1 and got[2][1] is None  # all-NULL group: NULL stats


def test_pagerank_empty_graph(spark):
    """Empty edge list returns an empty frame, not ZeroDivisionError."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        pagerank,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0


def test_per_group_pca_skips_null_groups(spark):
    """NULL group keys / NULL vectors are dropped, not a job-aborting
    ValueError inside applyInPandas."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.embeddings_stats import (
        per_group_pca,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [2.0, 1.0]), (None, [3.0, 3.0]), (1, None)],
        "label long, embedding array<double>",
    )
    got = {r["label"] for r in per_group_pca(df).collect()}
    assert got == {0}
