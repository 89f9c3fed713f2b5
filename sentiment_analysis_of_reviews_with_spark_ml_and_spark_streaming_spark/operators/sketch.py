"""Bounded-memory frequency sketches.

The 100 TB heavy-hitters problem: exact ``groupBy(value).count()``
shuffles one row per DISTINCT value — fine for token counts, ruinous
for high-cardinality keys (URLs, n-grams, user ids). A Misra-Gries
summary caps per-partition state at ``k`` counters and shuffles at
most ``k`` candidate rows per partition, independent of cardinality.

Guarantee (deterministic, partitioning-independent): any value with
global frequency > N/(k+1) SURVIVES into the merged candidate set
(Misra-Gries 1982; mergeability per Agarwal et al., PODS 2012). With
the exact-recount stage the output counts are exact for every
candidate, so "top-m by recounted candidates" equals the true top-m
whenever the true top-m all clear the N/(k+1) bar — which makes the
operator safely oracle-checkable against plain SQL top-m on skewed
(Zipfian: natural-language tokens) data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict, k: int) -> dict:
    """Shrink to ≤ k counters by the generalized MG decrement: subtract
    the (k+1)-th largest count from everything, drop non-positives."""
    if len(counters) <= k:
        return counters
    m = sorted(counters.values(), reverse=True)[k]
    return {v: c - m for v, c in counters.items() if c - m > 0}


def misra_gries_candidates(
    df: DataFrame, col: str, *, k: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries summaries, merged by summed counts.

    mapInPandas keeps exactly one ``k``-entry dict per partition (Arrow
    batches stream through it — memory is O(k + batch), never
    O(distinct)); each partition emits ≤ k (value, weight) rows, so
    the single groupBy shuffles ≤ k × num_partitions rows total.
    Weights are MG lower bounds, NOT exact counts — follow with
    ``heavy_hitters`` for the exact-recount contract.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for value, cnt in pdf[col].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            counters = _mg_reduce(counters, k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "mg_weight": list(counters.values())}
        )

    schema = f"{col} {dict(df.dtypes)[col]}, mg_weight long"
    summaries = df.select(col).mapInPandas(summarize, schema=schema)
    return summaries.groupBy(col).agg(F.sum("mg_weight").alias("mg_weight"))


def heavy_hitters(
    df: DataFrame, col: str, *, k: int = 256, top: int = 10
) -> DataFrame:
    """Top-``top`` heavy hitters: MG candidate generation + exact
    recount of candidates only.

    The recount joins the fact against the ≤ k×partitions candidate
    set (broadcast — candidate cardinality is capped by construction,
    unlike a data-dependent dimension), so the expensive side streams
    once with a hash probe and the full-cardinality shuffle never
    happens. Deterministic result whenever the true top-``top`` all
    have frequency > N/(k+1); ties broken by value for stable output.
    """
    cands = misra_gries_candidates(df, col, k=k).select(col)
    exact = (
        df.join(F.broadcast(cands), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    from .relational import top_k

    return top_k(exact, [F.col("cnt").desc(), F.col(col)], top)


def hll_build(
    df,
    group_cols: list[str],
    value_col: str,
    *,
    lg_k: int = 12,
):
    """Per-group mergeable HLL sketches (Apache DataSketches via
    Spark's native ``hll_sketch_agg``, JVM-side). The 100 TB pattern
    this enables: sketch ONCE at fine granularity (e.g. per day ×
    type), persist the binary column, then answer any coarser
    distinct-count rollup by merging sketches — no rescan of the fact
    data, and sketches are a few KB per group instead of the key set.
    """
    from pyspark.sql import functions as F

    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("hll_sketch")
    )


def hll_rollup(
    sketches,
    rollup_cols: list[str],
):
    """Merge persisted per-group sketches up to a coarser grouping and
    estimate: ``hll_union_agg`` + ``hll_sketch_estimate``. Input is
    the (tiny) sketch table, not the fact table — re-aggregation cost
    is O(groups), independent of corpus size."""
    from pyspark.sql import functions as F

    return sketches.groupBy(*rollup_cols).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll_sketch))").alias(
            "distinct_estimate"
        )
    )


def theta_build(
    df,
    group_cols: list[str],
    value_col: str,
):
    """Per-group Theta sketches (DataSketches via native
    ``theta_sketch_agg``). Unlike HLL, Theta sketches support full SET
    ALGEBRA — union, intersection, A-not-B — so persisted per-segment
    sketches answer audience-overlap questions ("users in BOTH
    segments") from KB-sized state, a query class exact distinct
    counting needs a fact-table join for."""
    from pyspark.sql import functions as F

    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_sketch_agg({value_col})").alias("theta_sketch")
    )


def theta_pair_overlap(sketches, group_col: str):
    """All-pairs segment overlap from the (tiny) sketch table: for
    each (a < b) pair of groups, the estimated |A ∩ B|. The pair join
    runs on |groups|² sketch rows — independent of corpus size."""
    from pyspark.sql import functions as F

    a = sketches.select(
        F.col(group_col).alias("segment_a"),
        F.col("theta_sketch").alias("_ska"),
    )
    b = sketches.select(
        F.col(group_col).alias("segment_b"),
        F.col("theta_sketch").alias("_skb"),
    )
    return (
        a.join(b, F.col("segment_a") < F.col("segment_b"))
        .select(
            "segment_a",
            "segment_b",
            F.expr(
                "theta_sketch_estimate(theta_intersection(_ska, _skb))"
            ).alias("overlap_estimate"),
        )
    )


def theta_a_not_b(sketches, group_col: str, seg_a: str, seg_b: str):
    """|A \\ B| from persisted sketches (``theta_difference``): the
    churn/exclusive-audience estimate — users in segment A that never
    appear in B — answered from KB-sized sketch state."""
    from pyspark.sql import functions as F

    a = sketches.filter(F.col(group_col) == seg_a).select(
        F.col("theta_sketch").alias("_ska")
    )
    b = sketches.filter(F.col(group_col) == seg_b).select(
        F.col("theta_sketch").alias("_skb")
    )
    return a.crossJoin(b).select(
        F.lit(seg_a).alias("segment_a"),
        F.lit(seg_b).alias("segment_b"),
        F.expr("theta_sketch_estimate(theta_difference(_ska, _skb))").alias(
            "a_not_b_estimate"
        ),
    )
