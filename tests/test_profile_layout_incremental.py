"""Column profiler, sorted-clustered writes, incremental dedup."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    dedup,
    layout,
    profile,
)

from .conftest import SF_DIR_SMOKE


def test_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 9.0), (3, "b", 2.5)],
        "id long, s string, x double",
    )
    got = {r["column"]: r for r in profile.profile_columns(df).collect()}
    assert got["id"]["n_rows"] == 4
    assert got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 3
    assert got["id"]["num_min"] == 1.0 and got["id"]["num_max"] == 3.0
    assert got["id"]["str_min"] is None
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["str_min"] == "a" and got["s"]["str_max"] == "b"
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["num_min"] == 1.5 and got["x"]["num_max"] == 9.0


def test_profile_is_one_scan(spark):
    df = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    plan = (
        profile.profile_columns(df, ["o_orderkey", "o_orderstatus"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, "profiler must not re-scan per column"


def test_write_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    out = str(tmp_path / "sorted")
    layout.write_sorted(df, out, "o_totalprice", n_files=4)
    ranges = []
    for f in sorted(glob.glob(out + "/*.parquet")):
        md = pq.read_metadata(f)
        col_idx = md.schema.names.index("o_totalprice")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {hi1} > {lo2}"
    # nothing lost
    n = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(out + "/*.parquet")
    )
    assert n == df.count()


def test_incremental_dedup_against_store(spark):
    store = spark.createDataFrame([], "fingerprint string")
    # seed the store with doc "known text"
    seed = spark.createDataFrame(
        [(100, "known text")], "doc_id long, text string"
    )
    _, delta0 = dedup.incremental_dedup(seed, store)
    store = delta0.select("fingerprint")

    batch = spark.createDataFrame(
        [
            (1, "known text"),        # already in store → dropped
            (2, "fresh content"),     # new → kept
            (3, "fresh content"),     # batch-internal dup → dropped
            (4, "KNOWN   text"),      # normalizes differently → kept
        ],
        "doc_id long, text string",
    )
    fresh, delta = dedup.incremental_dedup(batch, store)
    kept = {r["doc_id"] for r in fresh.collect()}
    assert kept == {2, 4}
    # delta carries exactly the new fingerprints with first-seen ids
    d = {r["first_seen_id"] for r in delta.collect()}
    assert d == {2, 4}
    # applying the delta then replaying the same batch yields nothing
    store2 = store.union(delta.select("fingerprint"))
    fresh2, _ = dedup.incremental_dedup(batch, store2)
    assert fresh2.count() == 0


def test_mergeable_rollup_merge_equals_recompute(spark):
    """The incremental-materialized-view contract:
    merge(rollup(A), rollup(B)) == rollup(A ∪ B) bit-for-bit, and
    derived stats match a direct computation."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        relational,
    )

    a = spark.createDataFrame(
        [("x", 1.5), ("x", 2.5), ("y", 10.0)], "k string, v double"
    )
    b = spark.createDataFrame(
        [("x", 4.0), ("z", -1.0), ("y", 0.0)], "k string, v double"
    )
    merged = relational.merge_rollups(
        relational.mergeable_rollup(a, ["k"], "v"),
        relational.mergeable_rollup(b, ["k"], "v"),
        ["k"],
    )
    full = relational.mergeable_rollup(a.unionByName(b), ["k"], "v")
    cols = ["k", "n", "sum_v", "min_v", "max_v", "sum_sq"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, full.select(cols).collect())
    )
    stats = {
        r["k"]: (r["avg_v"], r["var_v"])
        for r in relational.rollup_stats(merged).collect()
    }
    # x: values 1.5, 2.5, 4.0 -> avg 8/3, var = E[x^2]-E[x]^2
    import pytest as _pytest

    assert stats["x"][0] == _pytest.approx(round(8 / 3, 6))
    ex2 = (1.5**2 + 2.5**2 + 4.0**2) / 3
    assert stats["x"][1] == _pytest.approx(round(ex2 - (8 / 3) ** 2, 6), abs=2e-6)
    assert stats["z"] == (-1.0, 0.0)
