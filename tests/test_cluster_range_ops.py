"""Unit tests for the round-2 operators: connected-components dedup
clustering and the bucketed temporal range join — seeded inputs with
hand-checked expectations, independent of the DuckDB oracles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    dedup,
    relational,
)

from .conftest import SF_DIR_CORRECTNESS


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup.connected_components(df)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_cc_two_components(spark):
    # {1,2,3} via 1-2, 2-3 ; {10,11} ; node order in pairs shuffled
    got = _cc(spark, [(2, 1), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_diameter(spark):
    # a 7-node path needs several propagation rounds: 6-5-4-3-2-1-0
    got = _cc(spark, [(i, i + 1) for i in range(6)])
    assert got == {i: 0 for i in range(7)}


def test_cc_long_chain_converges_under_default_bound(spark):
    """64-node path, diameter 63: plain min-propagation would need 63
    rounds (> the default max_iter=20); pointer doubling must converge
    in O(log 63) ~ 6-7 rounds, well inside the bound."""
    got = _cc(spark, [(i, i + 1) for i in range(63)])
    assert got == {i: 0 for i in range(64)}


def test_cc_exhausted_iterations_warns_and_returns(spark):
    """A bound of 1 round on a 16-node path cannot reach the fixpoint:
    the call must still return a full labelling (bounded, no spin) and
    warn — a pathological 100 TB pair graph degrades, not hangs."""
    import warnings

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id_a long, id_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = {r["node"]: r["comp"] for r in
               dedup.connected_components(df, max_iter=1).collect()}
    assert len(out) == 16
    # labels are a valid refinement even when unconverged
    assert all(comp <= node for node, comp in out.items())
    assert any("no fixpoint" in str(w.message) for w in caught)


def test_cc_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (7, 8), (8, 7), (7, 8)])
    assert got == {5: 5, 7: 7, 8: 7}


def test_cc_star_converges_one_round(spark):
    got = _cc(spark, [(100, i) for i in range(1, 5)])
    assert set(got.values()) == {1}


def _range_join(spark, points, intervals):
    pts = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, m, s),) for (m, s) in points], "p_ts timestamp"
    )
    ivs = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, sm, ss), dt.datetime(2024, 1, 1, 0, em, es))
            for i, (sm, ss), (em, es) in intervals
        ],
        "iv_id long, w_start timestamp, w_end timestamp",
    )
    out = relational.range_join_point_in_interval(
        pts, ivs, point_ts="p_ts", start_col="w_start", end_col="w_end",
        bucket_seconds=60,
    )
    return sorted((r["iv_id"], r["p_ts"].minute, r["p_ts"].second) for r in out.collect())


def test_range_join_half_open_boundaries(spark):
    # interval [00:01:00, 00:03:00): point at start included, at end excluded
    got = _range_join(
        spark,
        points=[(0, 59), (1, 0), (2, 30), (3, 0)],
        intervals=[(1, (1, 0), (3, 0))],
    )
    assert got == [(1, 1, 0), (1, 2, 30)]


def test_range_join_no_duplicate_matches_across_buckets(spark):
    # interval spans 4 buckets; each in-range point matched exactly once
    got = _range_join(
        spark,
        points=[(0, 30), (1, 30), (2, 30), (3, 30)],
        intervals=[(7, (0, 15), (3, 45))],
    )
    assert got == [(7, 0, 30), (7, 1, 30), (7, 2, 30), (7, 3, 30)]


def test_range_join_disjoint_intervals_isolated(spark):
    got = _range_join(
        spark,
        points=[(1, 0), (4, 0)],
        intervals=[(1, (0, 30), (1, 30)), (2, (3, 30), (4, 30))],
    )
    assert got == [(1, 1, 0), (2, 4, 0)]


def test_pack_sequences_partitions_every_doc_once(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    bins = QUERIES["pack_sequences"](spark, SF_DIR_CORRECTNESS)
    rows = bins.collect()
    n_docs_total = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR_CORRECTNESS}/documents.parquet")
    assert n_docs_total == docs.count()
    # bin ids per (source, shard) start at 0 and are contiguous
    from collections import defaultdict

    by_part = defaultdict(list)
    for r in rows:
        by_part[(r["source"], r["shard"])].append(r["bin_id"])
    for ids in by_part.values():
        assert sorted(ids) == list(range(len(ids)))
    # a bin only ever exceeds capacity via its final overflowing doc:
    # the exclusive prefix within the bin stays < 2048, so any bin with
    # >1 doc has bin_tokens - (its largest doc) < 2048; cheap proxy:
    # no bin is empty and token counts are non-negative
    assert all(r["n_docs"] >= 1 and r["bin_tokens"] >= 0 for r in rows)


def test_contamination_excludes_benchmark_docs(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    out = QUERIES["contamination_check"](spark, SF_DIR_CORRECTNESS)
    rows = out.collect()
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all(0.0 <= r["overlap_ratio"] <= 1.0 for r in rows)
    assert all(
        (r["overlap_ratio"] >= 0.5) == bool(r["contaminated"]) for r in rows
    )


def test_training_data_pipeline_example(spark):
    """The end-to-end example composes cleanly: dedup only removes
    docs, splits partition the corpus, chunks cover every kept doc."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from examples.training_data_pipeline import build_training_corpus

    kept, chunks, report = build_training_corpus(spark, SF_DIR_CORRECTNESS)
    assert report["after_dedup"] <= report["after_quality"] <= report["raw_docs"]
    n_kept = kept.count()
    assert n_kept == report["after_dedup"]
    splits = dict(kept.groupBy("split").count().collect())
    assert sum(splits.values()) == n_kept
    assert set(splits) <= {"train", "val", "test"}
    assert chunks.select("doc_id").distinct().count() == n_kept


def test_deterministic_split_stable_under_corpus_growth(spark):
    """A doc's split assignment depends only on its id, so it must not
    change when the corpus scales (sf0.001 and sf0.01 share doc ids)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        _t,
    )

    def assign(sf):
        docs = _t(spark, sf, "documents")
        b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        split = F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test")
        return {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}

    small = assign("/root/testdata/sf0.001")
    big = assign("/root/testdata/sf0.01")
    common = set(small) & set(big)
    assert common, "fixtures share no doc ids"
    assert all(small[d] == big[d] for d in common)


def test_skew_safe_count_distinct_exact(spark):
    """Two-level salted distinct == direct countDistinct, on a fixture
    with one hot key owning 100x the distinct values of the rest."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        skew_safe_count_distinct,
    )

    hot = spark.range(2000).select(
        F.lit("hot").alias("k"), (F.col("id") % 1500).alias("v")
    )
    cold = spark.range(200).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        (F.col("id") % 15).alias("v"),
    )
    df = hot.unionAll(cold)
    got = {
        (r["k"], r["n_distinct"])
        for r in skew_safe_count_distinct(df, "k", "v", salt_buckets=8).collect()
    }
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert got == want and ("hot", 1500) in got


def test_distributed_row_number_matches_global_window(spark):
    """Bucketed prefix-offset rank == the one-reducer row_number, on
    keys crafted to land unevenly across range buckets (including an
    empty-bucket-prone skewed tail)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        distributed_row_number,
    )

    df = spark.range(3000).select(
        F.when(F.col("id") < 2500, F.col("id") % 97)
        .otherwise(F.lit(10_000) + F.col("id"))
        .alias("k"),
        F.col("id"),
    )
    got = {
        (r["k"], r["id"], r["rn"])
        for r in distributed_row_number(df, ["k", "id"], buckets=16).collect()
    }
    w = Window.orderBy("k", "id")
    want = {
        (r["k"], r["id"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_pareto_frontier_matches_bruteforce(spark):
    """Two-level bucketed skyline == the quadratic dominance scan, on
    a seeded random point cloud with duplicate points and axis ties."""
    import random

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        pareto_frontier_2d,
    )

    rng = random.Random(7)
    pts = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(500)]
    pts += pts[:25]  # duplicates must not self-dominate
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(tuple(r) for r in pareto_frontier_2d(df, "x", "y").collect())
    uniq = set(pts)
    want = sorted(
        p
        for p in uniq
        if not any(
            q != p and q[0] <= p[0] and q[1] <= p[1] for q in uniq
        )
    )
    assert got == want


def test_distributed_prefix_sum_matches_global_window(spark):
    """Range-bucketed prefix sum == the one-reducer cumulative window,
    on the same uneven-bucket key shape; values are integers so both
    reductions are exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        distributed_prefix_sum,
    )

    df = spark.range(3000).select(
        F.when(F.col("id") < 2500, F.col("id") % 97)
        .otherwise(F.lit(10_000) + F.col("id"))
        .alias("k"),
        F.col("id"),
        (F.col("id") % 11 - 5).alias("v"),  # negatives exercise offsets
    )
    got = {
        (r["k"], r["id"], r["ps"])
        for r in distributed_prefix_sum(
            df, ["k", "id"], "v", out_col="ps", buckets=16
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["id"], r["ps"])
        for r in df.withColumn("ps", F.sum("v").over(w)).collect()
    }
    assert got == want
