"""PageRank unit tests on graphs with hand-checkable structure."""

from __future__ import annotations

import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
    pagerank,
)


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_symmetric(spark):
    got = _pr(spark, [(1, 2), (2, 1)], iterations=20)
    assert got[1] == pytest.approx(0.5, abs=1e-6)
    assert got[2] == pytest.approx(0.5, abs=1e-6)


def test_star_center_dominates(spark):
    # 4 leaves all point at the hub
    got = _pr(spark, [(i, 99) for i in range(1, 5)], iterations=15)
    hub = got[99]
    for leaf in range(1, 5):
        assert hub > got[leaf] * 3


def test_chain_rank_increases_downstream(spark):
    got = _pr(spark, [(1, 2), (2, 3)], iterations=15)
    assert got[3] > got[2] > got[1]


def test_known_three_node_fixed_point(spark):
    """1→2, 1→3, 2→3, 3→1 — classic example with a closed-form fixed
    point; 30 iterations converge far below the tolerance."""
    got = _pr(spark, [(1, 2), (1, 3), (2, 3), (3, 1)], iterations=30)
    # fixed point: r1 = 0.15/3 + 0.85*r3 ; r2 = 0.15/3 + 0.85*r1/2 ;
    # r3 = 0.15/3 + 0.85*(r1/2 + r2)
    r1, r2, r3 = got[1], got[2], got[3]
    assert r1 == pytest.approx(0.05 + 0.85 * r3, abs=1e-6)
    assert r2 == pytest.approx(0.05 + 0.85 * r1 / 2, abs=1e-6)
    assert r3 == pytest.approx(0.05 + 0.85 * (r1 / 2 + r2), abs=1e-6)
    assert r3 > r1 > r2


def test_mass_conserved_without_dangling_nodes(spark):
    # strongly-connected: total rank stays ~1 (no dangling leak)
    got = _pr(spark, [(1, 2), (2, 3), (3, 1)], iterations=25)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
