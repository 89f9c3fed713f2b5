"""PageRank unit tests on graphs with hand-checkable structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_triangle_count_closed_forms(spark):
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        triangle_count,
    )

    def tc(pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_count(df).collect()[0]

    # K4: C(4,3)=4 triangles; wedges = 4*C(3,2)=12; clustering = 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = tc(k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["global_clustering"] == 1.0
    # path graph: zero triangles
    r = tc([(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0
    # triangle + pendant: 1 triangle; duplicate/reversed edges collapse
    r = tc([(0, 1), (1, 0), (1, 2), (2, 0), (2, 0), (2, 3)])
    assert (r["n_edges"], r["n_triangles"]) == (4, 1)


# --- bounded multi-source BFS ---------------------------------------------


def _bfs(spark, edges, sources, **kw):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        bfs_distances,
    )

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: r["dist"] for r in bfs_distances(e, s, **kw).collect()
    }


def test_bfs_chain_distances(spark):
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1], max_hops=3)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops


def test_bfs_multi_source_takes_min(spark):
    got = _bfs(spark, [(1, 2), (2, 3), (5, 3)], [1, 5], max_hops=3)
    assert got == {1: 0, 5: 0, 2: 1, 3: 1}


def test_bfs_cycle_keeps_source_at_zero(spark):
    got = _bfs(spark, [(1, 2), (2, 1)], [1], max_hops=3)
    assert got == {1: 0, 2: 1}


def test_bfs_early_exit_on_empty_frontier(spark):
    # component exhausted at hop 1; hops 2..10 must not loop
    got = _bfs(spark, [(1, 2)], [1], max_hops=10)
    assert got == {1: 0, 2: 1}


def test_bfs_directed_edges_not_symmetric(spark):
    got = _bfs(spark, [(2, 1)], [1], max_hops=2)
    assert got == {1: 0}


def test_bellman_ford_prefers_lighter_multi_hop_path(spark):
    """Weighted relaxation must pick a cheaper 2-hop path over a
    heavier direct edge (the case hop-counting BFS gets wrong), carry
    exact integer totals, and bound results at max_hops edges."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        bellman_ford_bounded,
    )

    edges = spark.createDataFrame(
        [
            (1, 2, 10),  # heavy direct
            (1, 3, 1),
            (3, 2, 2),   # 1->3->2 = 3 beats direct 10
            (2, 4, 1),   # best to 4: 1->3->2->4 = 4 (3 hops)
            (4, 5, 1),   # 5 in <=3 edges only via the heavy direct
        ],                # route 1->2->4->5 = 12 (the 4-edge route
        "src long, dst long, w long",  # costing 5 is out of budget)
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bellman_ford_bounded(edges, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 3: 1, 2: 3, 4: 4, 5: 12}
    # raising the budget lets the lighter 4-edge route to 5 win
    got4 = {
        r["node"]: r["dist"]
        for r in bellman_ford_bounded(edges, seeds, max_hops=4).collect()
    }
    assert got4[5] == 5


def test_bellman_ford_rejects_fractional_weights(spark):
    """r9 review pass: a double weight column was silently truncated by
    the long accumulation at every relaxation — plausible-looking wrong
    distances. The integral-weight contract is now enforced up front."""
    import pytest as _pytest

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        bellman_ford_bounded,
    )

    edges = spark.createDataFrame(
        [(1, 2, 0.5), (2, 3, 0.5)], "src long, dst long, w double"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    with _pytest.raises(ValueError, match="integral weight"):
        bellman_ford_bounded(edges, sources, max_hops=3)


def test_bellman_ford_decimal_scale_gate(spark):
    """ADVICE r9: DECIMAL(p, 0) weights are exactly integral — min-plus
    stays exact — so the gate accepts them; nonzero scale still raises
    (those values would be truncated by the long accumulation)."""
    import pytest as _pytest

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        bellman_ford_bounded,
    )

    seeds = spark.createDataFrame([(1,)], "node long")
    ok = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 2)], "src long, dst long, w long"
    ).withColumn("w", F.col("w").cast("decimal(20,0)"))
    got = {
        r["node"]: r["dist"]
        for r in bellman_ford_bounded(ok, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 3: 1, 2: 3}
    bad = ok.withColumn("w", F.col("w").cast("decimal(20,2)"))
    with _pytest.raises(ValueError, match="integral weight"):
        bellman_ford_bounded(bad, seeds, max_hops=3)


def test_bfs_bipartite_equals_edge_list_bfs_randomized(spark):
    """bfs_distances_bipartite over a (group, item) incidence must
    agree EXACTLY with bfs_distances over the derived co-membership
    edge set {(a,b): share a group, a != b} — the r13 rewrite's
    semantic contract, checked on seeded random bipartite graphs
    (including isolated seeds, singleton groups, and multi-group
    overlaps)."""
    import random

    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.graph import (
        bfs_distances,
        bfs_distances_bipartite,
    )

    for seed in (7, 21):
        rng = random.Random(seed)
        n_groups, n_items = 25, 60
        inc = sorted(
            {
                (rng.randrange(n_groups), rng.randrange(n_items))
                for _ in range(150)
            }
        )
        inc_df = spark.createDataFrame(inc, "basket int, item int")
        seeds = sorted(rng.sample(range(n_items), 5))
        seeds_df = spark.createDataFrame(
            [(s,) for s in seeds], "node int"
        )
        # derived pairwise edge set (what the old plan materialized)
        by_group: dict[int, list[int]] = {}
        for g, i in inc:
            by_group.setdefault(g, []).append(i)
        edges = sorted(
            {
                (a, b)
                for members in by_group.values()
                for a in members
                for b in members
                if a != b
            }
        )
        edges_df = spark.createDataFrame(edges, "src int, dst int")
        got_bip = {
            r["node"]: r["dist"]
            for r in bfs_distances_bipartite(
                inc_df, seeds_df, max_hops=3
            ).collect()
        }
        got_edge = {
            r["node"]: r["dist"]
            for r in bfs_distances(edges_df, seeds_df, max_hops=3).collect()
        }
        assert got_bip == got_edge, (seed, got_bip, got_edge)
