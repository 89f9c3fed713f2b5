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

    NULLs are excluded by contract (filtered explicitly, not left to
    pandas' dropna default): a sketch keyed on NULL cannot survive the
    groupBy merge deterministically, so callers needing the NULL mass
    should count it separately with one ``count_if(col IS NULL)``.
    """
    df = df.filter(F.col(col).isNotNull())

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


# --- Engine-portable Count-Min Sketch -------------------------------------
#
# The CMS answers point-frequency queries from depth x width counters
# regardless of key cardinality: at 100 TB a token-frequency table over
# a web corpus has ~1e9 distinct keys (a ruinous shuffle), while a
# (4 x 65536) CMS is 2 MB of state built with ONE map-side-combined
# shuffle whose key domain is depth*width, independent of cardinality.
# Guarantee (deterministic): est(x) >= true(x) always; est(x) <=
# true(x) + eps*N with probability 1-delta for width = e/eps, depth =
# ln(1/delta) (Cormode & Muthukrishnan, J. Algorithms 2005).
#
# The hash family is the repo's portable convention (md5 prefix ->
# bigint, see textstats.md5_prefix_long), so a DuckDB twin recomputes
# the IDENTICAL counter table and estimates — the sketch itself is
# value-hash oracle-checkable, not just its error bound.

CMS_SALT = "cms"


def _cms_bucket(value, row: int, width: int, seed: int):
    """Bucket of ``value`` in CMS row ``row``: portable md5 hash of the
    salted value, reduced mod width. DuckDB twin:
    ``CAST('0x' || substr(md5('cms<seed>:<row>:' || v), 1, 15) AS BIGINT) % width``."""
    from .textstats import md5_prefix_long

    c = F.col(value) if isinstance(value, str) else value
    salted = F.concat(F.lit(f"{CMS_SALT}{seed}:{row}:"), c)
    return md5_prefix_long(salted) % width


def countmin_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
) -> DataFrame:
    """Build the CMS counter table: one row per (row_idx, bucket) with
    the summed hit count. Plan: project depth bucket ids per input row
    (codegen md5), explode to (row_idx, bucket), ONE groupBy whose key
    domain is <= depth*width — partial aggregation collapses each
    partition to <= depth*width rows before the shuffle, so shuffle
    volume is O(partitions * depth * width), independent of input size
    or key cardinality.

    NULL values are EXCLUDED (the misra_gries/bloom convention — r12
    review): an unfiltered NULL salts to a NULL md5 and lands depth
    junk (row_idx, NULL-bucket) counter rows in the sketch — they can
    never match a real probe's bucket, but they pad the counter table
    and make the build-side NULL contract silently diverge from the
    probe side, which already excludes NULLs."""
    df = df.filter(F.col(value_col).isNotNull())
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_idx"),
                        _cms_bucket(value_col, j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row_idx", "rb.bucket")
    return pairs.groupBy("row_idx", "bucket").agg(
        F.count("*").alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
) -> DataFrame:
    """Point estimates for ``probes[value_col]``: min over the depth
    counters addressed by the probe's buckets. The sketch side is tiny
    (<= depth*width rows) and broadcast; the probe side never
    shuffles. Missing buckets count 0 (value never seen). NULL probes
    are excluded like NULL build values — membership of "not a value"
    is undefined, not zero."""
    probes = probes.filter(F.col(value_col).isNotNull())
    pb = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_idx"),
                        _cms_bucket(value_col, j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(value_col, "rb.row_idx", "rb.bucket")
    joined = pb.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


# --- Engine-portable Bloom filter -----------------------------------------
#
# Set-membership from num_bits of state: k portable hash positions per
# value; a probe is positive iff ALL k bits are set. No false
# negatives ever (deterministic); false-positive rate ~ (1-e^{-kn/m})^k.
# At 100 TB this is the semi-join reducer: ship a MB-scale bit set
# instead of a billion-key IN-list (Spark's own runtime bloom join
# does exactly this JVM-side — this variant trades its xxhash64 family
# for the md5-portable one so the WHOLE filter, not just its contract,
# replays in the SQL oracle).

BLOOM_SALT = "bloom"


def _bloom_bit(value, k: int, num_bits: int, seed: int):
    from .textstats import md5_prefix_long

    c = F.col(value) if isinstance(value, str) else value
    salted = F.concat(F.lit(f"{BLOOM_SALT}{seed}:{k}:"), c.cast("string"))
    return md5_prefix_long(salted) % num_bits


def bloom_build(
    df: DataFrame,
    value_col: str,
    *,
    num_bits: int = 8192,
    num_hashes: int = 5,
    seed: int = 3,
) -> DataFrame:
    """The set bit positions (one row per distinct set bit, <= num_bits
    rows): explode k positions per value, distinct. Partial-aggregate
    collapses each partition to <= num_bits rows pre-shuffle.

    NULL values are EXCLUDED (the misra_gries_candidates convention): a
    NULL salts to a NULL hash that sets no real bit, so an unfiltered
    NULL would silently "build" nothing and then probe as a FALSE
    NEGATIVE — violating the no-false-negatives contract."""
    df = df.filter(F.col(value_col).isNotNull())
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _bloom_bit(value_col, k, num_bits, seed)
                        for k in range(num_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    num_bits: int = 8192,
    num_hashes: int = 5,
    seed: int = 3,
) -> DataFrame:
    """Membership test: probe is bloom-positive iff all num_hashes of
    its bit positions are set. The bit set (<= num_bits rows) is
    broadcast; probes never shuffle except the final per-probe count
    (key domain = probes). NULL probes are excluded like NULL build
    values — membership of "not a value" is undefined, not false."""
    probes = probes.filter(F.col(value_col).isNotNull())
    # dedupe probe VALUES before exploding: a value probed twice would
    # otherwise join 2×num_hashes bit rows and fail the == num_hashes
    # membership test — a false negative, violating the bloom contract.
    # (Deduping (value, bit) pairs instead would break the other way:
    # two hash functions colliding on one bit is legal and must still
    # count as num_hashes joined rows.)
    pb = probes.select(value_col).distinct().select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    _bloom_bit(value_col, k, num_bits, seed)
                    for k in range(num_hashes)
                ]
            )
        ).alias("bit"),
    )
    hits = pb.join(F.broadcast(bits), "bit").groupBy(value_col).agg(
        F.count("*").alias("_nbits")
    )
    return probes.select(value_col).distinct().join(
        F.broadcast(hits), value_col, "left"
    ).select(
        F.col(value_col),
        (F.coalesce(F.col("_nbits"), F.lit(0)) == num_hashes).alias(
            "bloom_member"
        ),
    )
