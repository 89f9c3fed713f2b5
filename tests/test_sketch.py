"""Misra-Gries sketch: retention guarantee, merge behavior, recount
exactness — on seeded skewed data with hand-computable truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    sketch,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.sketch import (
    _mg_reduce,
)


def test_mg_reduce_decrement_semantics():
    # k=2: third-largest count (2) is subtracted from all
    got = _mg_reduce({"a": 10, "b": 5, "c": 2, "d": 1}, 2)
    assert got == {"a": 8, "b": 3}
    # already small enough: untouched
    assert _mg_reduce({"a": 1}, 2) == {"a": 1}


def _skewed(spark, n_parts=8):
    # 'hot' appears 300×, 'warm' 100×, 100 singletons — N=500,
    # with k=16 the bar is N/17 ≈ 29.4: hot and warm must survive
    rows = (
        [("hot",)] * 300 + [("warm",)] * 100 + [(f"cold{i}",) for i in range(100)]
    )
    return spark.createDataFrame(rows, "v string").repartition(n_parts)


def test_heavy_hitters_retains_guaranteed_values(spark):
    df = _skewed(spark)
    top = sketch.heavy_hitters(df, "v", k=16, top=2).collect()
    assert [(r["v"], r["cnt"]) for r in top] == [("hot", 300), ("warm", 100)]


def test_heavy_hitters_counts_are_exact_not_lower_bounds(spark):
    df = _skewed(spark)
    got = {r["v"]: r["cnt"] for r in sketch.heavy_hitters(df, "v", k=16, top=2).collect()}
    # recount stage: exact frequencies, not MG weights
    assert got == {"hot": 300, "warm": 100}


def test_candidate_set_is_bounded(spark):
    df = _skewed(spark, n_parts=4)
    cands = sketch.misra_gries_candidates(df, "v", k=16)
    # ≤ k × partitions candidates ever reach the merge
    assert cands.count() <= 16 * 4


def test_guarantee_independent_of_partitioning(spark):
    for parts in (1, 3, 13):
        df = _skewed(spark, n_parts=parts)
        top = sketch.heavy_hitters(df, "v", k=16, top=2).collect()
        assert {r["v"] for r in top} == {"hot", "warm"}, f"parts={parts}"


def test_uniform_data_degrades_gracefully(spark):
    # no value clears N/(k+1): output is still a valid exact-counted
    # top-k of SOME candidate subset (approximation contract)
    rows = [(f"u{i % 50}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    top = sketch.heavy_hitters(df, "v", k=8, top=5).collect()
    assert len(top) <= 5
    # every reported count is a true exact count (4 each here)
    for r in top:
        assert r["cnt"] == 4


def test_hll_rollup_matches_exact_on_small_cardinality(spark):
    """Sparse-mode HLL is exact at small cardinality: per-group sketch
    + merged rollup must equal exact distinct counts, and merging must
    dedupe across groups (users appearing on multiple days count
    once)."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        sketch,
    )

    rows = []
    for day in ["d1", "d2"]:
        for u in range(50):  # same 50 users both days
            rows.append(("click", day, u))
    rows += [("view", "d1", u) for u in range(30)]
    df = spark.createDataFrame(rows, "event_type string, day string, user_id long")
    fine = sketch.hll_build(df, ["event_type", "day"], "user_id")
    assert fine.count() == 3  # (click,d1) (click,d2) (view,d1)
    rolled = {
        r["event_type"]: r["distinct_estimate"]
        for r in sketch.hll_rollup(fine, ["event_type"]).collect()
    }
    assert rolled == {"click": 50, "view": 30}  # dedup across days


def test_theta_set_algebra_exact_below_sampling_threshold(spark):
    """Theta sketches in exact mode: union/intersection estimates on
    planted overlapping segments match exact set sizes."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        sketch,
    )

    rows = [("a", u) for u in range(100)] + [("b", u) for u in range(60, 160)]
    df = spark.createDataFrame(rows, "segment string, user_id long")
    sk = sketch.theta_build(df, ["segment"], "user_id")
    overlap = sketch.theta_pair_overlap(sk, "segment").collect()
    assert len(overlap) == 1
    assert overlap[0]["segment_a"] == "a" and overlap[0]["segment_b"] == "b"
    assert overlap[0]["overlap_estimate"] == 40  # |[60,100)| exactly


def test_theta_a_not_b_exact_on_planted_segments(spark):
    """A\\B from sketches equals the exact exclusive count in exact
    mode: 100-user segment A, B overlaps the last 40 -> |A\\B| = 60."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
        sketch,
    )

    rows = [("a", u) for u in range(100)] + [("b", u) for u in range(60, 160)]
    df = spark.createDataFrame(rows, "segment string, user_id long")
    sk = sketch.theta_build(df, ["segment"], "user_id")
    r = sketch.theta_a_not_b(sk, "segment", "a", "b").collect()[0]
    assert r["a_not_b_estimate"] == 60
    r2 = sketch.theta_a_not_b(sk, "segment", "b", "a").collect()[0]
    assert r2["a_not_b_estimate"] == 60  # |B\A| = users 100..159


# --- portable Count-Min Sketch --------------------------------------------


def test_countmin_estimates_upper_bound_and_tight_on_skew(spark):
    df = _skewed(spark)
    sk = sketch.countmin_build(df, "v", depth=4, width=256, seed=11)
    exact = df.groupBy("v").agg(F.count("*").alias("exact"))
    est = sketch.countmin_estimate(
        sk, exact.select("v"), "v", depth=4, width=256, seed=11
    )
    joined = {
        r["v"]: (r["exact"], r["cms_est"])
        for r in exact.join(est, "v").collect()
    }
    n = 500
    eps_n = (2.718281828 / 256) * n  # e/width * N, the CMS error bar
    for v, (ex, e) in joined.items():
        assert e >= ex, f"{v}: CMS underestimated ({e} < {ex})"
        assert e <= ex + eps_n, f"{v}: overcount beyond eps*N ({e} vs {ex})"
    # hot keys are far above any collision noise: estimates exact-ish
    assert joined["hot"][1] - joined["hot"][0] <= 5


def test_countmin_sketch_size_is_bounded_by_depth_width(spark):
    df = _skewed(spark)
    sk = sketch.countmin_build(df, "v", depth=4, width=32, seed=11)
    assert sk.count() <= 4 * 32
    # total mass per row equals N (each row hashes every input once)
    per_row = {
        r["row_idx"]: r["mass"]
        for r in sk.groupBy("row_idx")
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    }
    assert set(per_row) == {0, 1, 2, 3}
    assert all(m == 500 for m in per_row.values())


def test_countmin_never_seen_value_estimates_near_zero(spark):
    df = _skewed(spark)
    sk = sketch.countmin_build(df, "v", depth=4, width=1024, seed=11)
    probes = spark.createDataFrame([("never-seen-xyz",)], "v string")
    est = sketch.countmin_estimate(
        sk, probes, "v", depth=4, width=1024, seed=11
    )
    # min over 4 rows of a sparse table: collisions in ALL 4 rows are
    # needed to report mass; with 202 keys over 1024 buckets that is
    # possible but the estimate must stay within the eps*N bar
    assert est.collect()[0]["cms_est"] <= (2.718281828 / 1024) * 500


# --- portable Bloom filter ------------------------------------------------


def test_bloom_no_false_negatives_ever(spark):
    members = spark.createDataFrame(
        [(i,) for i in range(0, 400, 2)], "k long"
    )
    bits = sketch.bloom_build(members, "k", num_bits=2048, num_hashes=5)
    probed = sketch.bloom_probe(
        bits,
        spark.createDataFrame([(i,) for i in range(400)], "k long"),
        "k",
        num_bits=2048,
        num_hashes=5,
    )
    got = {r["k"]: r["bloom_member"] for r in probed.collect()}
    for i in range(0, 400, 2):
        assert got[i] is True, f"false negative on member {i}"


def test_bloom_false_positive_rate_within_theory(spark):
    import math

    n, m, k = 200, 2048, 5
    members = spark.createDataFrame([(i,) for i in range(n)], "k long")
    bits = sketch.bloom_build(members, "k", num_bits=m, num_hashes=k)
    non_members = spark.createDataFrame(
        [(i,) for i in range(10_000, 12_000)], "k long"
    )
    probed = sketch.bloom_probe(
        bits, non_members, "k", num_bits=m, num_hashes=k
    )
    fp = probed.filter(F.col("bloom_member")).count()
    rate = fp / 2000
    theory = (1 - math.exp(-k * n / m)) ** k
    # generous 4x margin over the asymptotic rate (small-m variance)
    assert rate <= max(4 * theory, 0.02), (rate, theory)


def test_bloom_bit_count_bounded(spark):
    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bits = sketch.bloom_build(members, "k", num_bits=512, num_hashes=5)
    n_bits = bits.count()
    assert n_bits <= min(512, 100 * 5)
    assert n_bits > 100  # 500 draws over 512 slots: far more than 100 set


def test_bloom_duplicate_probes_no_false_negative(spark):
    """A value probed more than once must still test positive: the hit
    count compares against num_hashes per VALUE, so duplicate probe
    rows (2x the bit joins) previously flipped members to false."""
    members = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    bits = sketch.bloom_build(members, "v", num_bits=1024, num_hashes=5)
    probes = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("z",), ("z",)], "v string"
    )
    got = {
        r["v"]: r["bloom_member"]
        for r in sketch.bloom_probe(
            bits, probes, "v", num_bits=1024, num_hashes=5
        ).collect()
    }
    assert got["a"] is True  # was False before the dedup fix
    assert len(got) == 2  # one verdict per distinct value


def test_misra_gries_excludes_nulls_by_contract(spark):
    """NULLs are filtered before sketching (documented contract) — a
    mostly-NULL column must not crash or smuggle a NULL candidate."""
    df = spark.createDataFrame(
        [(None,)] * 40 + [("x",)] * 5 + [("y",)] * 2, "v string"
    )
    got = {r["v"] for r in sketch.misra_gries_candidates(df, "v", k=4).collect()}
    assert None not in got and "x" in got
