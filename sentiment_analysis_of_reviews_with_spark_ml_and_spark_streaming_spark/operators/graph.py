"""Iterative graph algorithms on DataFrames.

Companion to the min-label-propagation connected components in
``operators/dedup.py``: same execution discipline — per-iteration
state is (node, scalar) only, each round is one keyed shuffle, and
``localCheckpoint`` truncates lineage so round N's plan doesn't
replay rounds 1..N-1 (the classic iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Per iteration: contribs = rank(src)/out_degree(src) summed per dst
    (one shuffle on dst, carrying (node, double) — never adjacency),
    then rank = (1-d)/N + d·contrib. Dangling nodes (no out-edges)
    leak mass, the standard simple variant — ranks still order
    correctly; normalize downstream if probabilities are needed.

    Scale shape: the edge list is hash-partitioned on ``src`` ONCE and
    persisted — every iteration's rank join reuses that partitioning
    (only the (node, rank) side, |V| rows, moves per round). State per
    round is |V| × 16 bytes; iterations are a fixed constant, so total
    cost is O(iterations × (|E| map + |V| shuffle)).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    adj = e.join(out_deg, "src").repartition("src").persist()
    adj.count()  # materialize once; every iteration reuses this layout

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            adj.join(ranks, adj.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return ranks
