"""Relational helpers: broadcast dim joins, top-k, histogram, set ops.

Covers the reference's whole relational surface (SURVEY.md §2.2-2.6):
single-key left-outer dim joins (Yelp_Data_PreProcessing.py:97,103),
group-by counts + top-k (Scalable_EDA_Final.py:187-189), the
RDD-histogram escape hatch (Scalable_EDA_Final.py:140), distinct,
random split — all kept inside Catalyst.

Scale notes:
- ``join_dim`` broadcasts the dimension side explicitly; at 100 TB the
  fact side never shuffles for a dim join.
- ``top_k`` relies on Spark planning ``TakeOrderedAndProject`` (partial
  per-partition top-k, no global sort materialization).
- ``histogram`` is two scans (min/max agg, then bucket agg) instead of
  the reference's collect-to-RDD; both scans are map-side-combined
  hash aggregates.
- ``salted_join`` is the skew escape hatch when AQE skew handling is
  not enough (documented for cluster use; unit-tested locally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact ⋈ dimension equi-join; dim side broadcast by default."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k; plans as TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Per-group top-k via row_number window (single shuffle on the
    group keys). Order columns must produce a total order for
    determinism (tie-break on a unique key)."""

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
    )


def histogram(df: DataFrame, col: str, buckets: int = 10) -> DataFrame:
    """Equi-width histogram, DataFrame-native.

    Replaces ``df.rdd.flatMap(...).histogram(10)``
    (Scalable_EDA_Final.py:140,146) — which collects bounds on the
    driver and leaves Catalyst — with min/max agg + floor-bucketing +
    hash aggregate. Top bucket is closed (max value included), matching
    RDD.histogram semantics — including NULL handling: RDD.histogram
    never sees NULLs (flatMap drops them), so they are filtered before
    bucketing here too. Without the filter a NULL row produced a
    spurious bucket=NULL output row — or, in the degenerate hi==lo
    branch, was silently counted into bucket 0.

    Empty-input contract (deliberate deviation): an empty or all-NULL
    input returns ``buckets`` zero-count rows, NOT an empty frame —
    the bounds agg always yields one row, and zero-filling every bin is
    what positional consumers (and the SQL oracle twin) rely on.
    ``RDD.histogram`` instead RAISES on empty input; callers that need
    that behavior must pre-check emptiness themselves.
    """
    c = F.col(col).cast("double")
    df = df.filter(c.isNotNull())
    bounds = df.agg(
        F.min(c).alias("lo"), F.max(c).alias("hi")
    )
    # one tiny row; cross-join broadcast keeps it fully distributed.
    # Degenerate range (hi == lo) → everything lands in bucket 0
    # (ANSI mode would otherwise raise DIVIDE_BY_ZERO).
    bucketed = df.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), 0)
        .otherwise(
            F.least(
                F.floor((c - F.col("lo")) / ((F.col("hi") - F.col("lo")) / buckets)),
                F.lit(buckets - 1),
            )
        )
        .cast("int")
        .alias("bucket")
    )
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("count"))
    # emit EVERY bucket, zero-filled — RDD.histogram returns one count
    # per bin; omitting empty bins (the old behavior) broke positional
    # consumers and misread gap-heavy distributions
    all_buckets = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("bucket")
    )
    return (
        all_buckets.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("count"),
        )
        .orderBy("bucket")
    )


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    return df.dropDuplicates(subset) if subset else df.distinct()


def random_split(
    df: DataFrame, weights: list[float], seed: int = 100
) -> list[DataFrame]:
    """Seeded randomSplit parity (Scalable_Project_ML_Model_Analysis.py:172)."""
    return df.randomSplit(weights, seed=seed)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row of
    the same key with right.ts <= left.ts (inclusive).

    Spark has no ASOF JOIN; the naive formulations (theta-join +
    per-row max, or a correlated subquery) are O(n·m) per key. This is
    the scalable composition: tag + UNION both sides, one shuffle on
    the key, and ``last(..., ignorenulls=True)`` over the ts-ordered
    window carries the most recent right values forward onto left
    rows. Cost = one shuffle + one sort per key — the same shape as
    sessionization, independent of match distances.

    Returns all left rows + ``value_cols`` from the matched right row
    (+ ``matched_ts``), nulls where no right row precedes.
    """
    value_cols = value_cols or []
    l_cols = left.columns
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    # NULL-ts right rows can never satisfy right.ts <= left.ts (ASOF
    # semantics; DuckDB agrees) — unfiltered they sort nulls-first and
    # become a spurious fallback match for left rows preceding every
    # real right row.
    rt = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )

    # Carry ONE struct keyed on the row's presence (ts is never null on
    # a right row), not per-column last(ignorenulls): per-column carry
    # would skip a matched row's genuinely-NULL value in favor of an
    # older row's value, diverging from standard ASOF semantics (and
    # DuckDB's ASOF JOIN), which return the latest row's NULL as-is.
    pack = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_r_ts").alias("_ts"),
            *[F.col(f"_r_{c}").alias(c) for c in value_cols],
        ),
    )
    # right rows sort before left rows at equal ts → inclusive match;
    # the tiebreak struct makes two right rows sharing (key, ts)
    # resolve to ONE deterministic winner (field-wise greatest)
    # instead of whichever the shuffle ordered last. It mirrors pack
    # but recursively canonicalizes every map — at any nesting depth
    # (top-level, inside arrays, inside struct fields) — to its sorted
    # entries array: maps have no ordering in Spark and would fail
    # analysis in an ORDER BY, while the sorted-entries form IS
    # orderable and identifies the map's content exactly.
    def _canon(col: Column, dt) -> Column:
        if isinstance(dt, MapType):
            return F.array_sort(
                F.transform(
                    F.map_entries(col),
                    lambda e: F.struct(
                        _canon(e["key"], dt.keyType).alias("key"),
                        _canon(e["value"], dt.valueType).alias("value"),
                    ),
                )
            )
        if isinstance(dt, ArrayType) and _has_map(dt.elementType):
            return F.transform(col, lambda x: _canon(x, dt.elementType))
        if isinstance(dt, StructType) and any(
            _has_map(f.dataType) for f in dt.fields
        ):
            return F.struct(
                *[_canon(col[f.name], f.dataType).alias(f.name) for f in dt.fields]
            )
        return col

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    tiebreak = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col("_r_ts").alias("_ts"),
            *[
                _canon(
                    F.col(f"_r_{c}"), right.schema[c].dataType
                ).alias(c)
                for c in value_cols
            ],
        ),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"), tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = lt.unionByName(rt)
    filled = unioned.select(
        "*", F.last(pack, ignorenulls=True).over(w).alias("_m")
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col(f"_m.{c}").alias(f"right_{c}") for c in value_cols],
        F.col("_m._ts").alias("matched_ts"),
    )
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact key, explode the dim side.

    For the case where one join key dominates (e.g. one user wrote 1%
    of all reviews). AQE's skew-join split usually handles this; this
    operator is the explicit fallback for deterministic plans.

    Only ``inner`` and ``left`` (fact-preserving) joins are accepted:
    the dim side is EXPLODED across all salts, so a right/full outer
    join would emit every unmatched dim row ``salt_buckets`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left only: the exploded dim "
            f"side would duplicate unmatched dim rows under {how!r}"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Temporal range join with NO equi key: point ∈ [start, end).

    The naive plan is a cartesian product with a range filter —
    O(points × intervals), a broadcast-nested-loop at best. This
    operator applies the standard bucketing rewrite: quantize time
    into ``bucket_seconds`` buckets, explode each interval to the
    buckets it overlaps (``sequence`` of epoch-bucket ids), tag each
    point with its single bucket, equi-join on bucket id, then apply
    the exact half-open range predicate. Each (interval, point) match
    is produced exactly once because a point lives in exactly one
    bucket.

    Scale: shuffle is hash(bucket) on both sides — linear in
    points + intervals × ⌈span/bucket⌉. Pick ``bucket_seconds`` close
    to the typical interval length so intervals explode to ~2 buckets;
    time-skew (a hot bucket) is handled by AQE skew-join splitting.

    Returns the joined frame with all columns from both inputs.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col))))
    )
    pt = points.withColumn("_bucket", bucket(F.col(point_ts)))
    return (
        iv.join(pt, on="_bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )


def mergeable_rollup(df, keys: list[str], value_col: str):
    """Aggregate ``value_col`` per key group into a MERGEABLE state row:
    (count, decimal sum, min, max, sum of squares). Every component is
    an algebraic aggregate — two state rows combine into one with no
    access to base data — which is what makes incremental materialized-
    view maintenance possible: aggregate each new partition/batch once,
    then fold it into the stored rollup with :func:`merge_rollups`.
    Derived stats (avg, variance) come from the state at read time —
    from the NON-NULL count ``nn`` (SQL AVG/VAR semantics), not the row
    count ``n``: with NULL values present, sum/row-count would
    understate the mean and inflate the variance.
    Decimal sums keep the merge bit-exact regardless of merge order."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.count(value_col).alias("nn"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.sum(
            F.col(value_col).cast("decimal(28,6)")
            * F.col(value_col).cast("decimal(28,6)")
        ).alias("sum_sq"),
    )


def merge_rollups(base, delta, keys: list[str]):
    """Fold a delta rollup into a base rollup — the incremental
    materialized-view step: cost is O(|touched key groups|), never a
    rescan of base data. All components are algebraic (count/sum/min/
    max/sum-of-squares), so ``merge(rollup(A), rollup(B)) ==
    rollup(A ∪ B)`` exactly — asserted by the recompute-equivalence
    test. Decimal sums make the equality independent of merge order."""
    both = base.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("nn").alias("nn"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_sq").alias("sum_sq"),
    )


def rollup_stats(rollup):
    """Read-time derived statistics from mergeable state: avg and
    population variance via sum/sum_sq over the NON-NULL count
    (SQL AVG/VAR_POP semantics; decimal → double at the end, one
    deterministic division). try_divide: an all-NULL group yields NULL
    stats, exactly as SQL AVG would, instead of an ANSI error."""
    nn = F.col("nn").cast("double")
    s = F.col("sum_v").cast("double")
    sq = F.col("sum_sq").cast("double")
    mean = F.try_divide(s, nn)
    return rollup.withColumns(
        {
            "avg_v": F.round(mean, 6),
            "var_v": F.round(F.try_divide(sq, nn) - mean * mean, 6),
        }
    )


def efraimidis_spirakis_key(id_col: str, weight_col: str):
    """THE Efraimidis-Spirakis reservoir key — ln(u)/w with u derived
    from the first 8 md5 hex chars of the id ((h + 0.5) / 2^32, exact
    in double), rounded to 9. Float-critical and cross-engine/
    stream-batch bit-sensitive: the batch sampler, its SQL twins, and
    streaming_weighted_reservoir must all compute the IDENTICAL
    expression, so it lives in exactly one place (the
    textstats.md5_prefix_long rule: any change lands everywhere
    together or equality breaks silently)."""
    from .textstats import md5_prefix_long

    h = md5_prefix_long(F.col(id_col).cast("string"), nchars=8).cast(
        "double"
    )
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    return F.round(F.log(u) / F.col(weight_col).cast("double"), 9)


def weighted_sample_per_group(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: exactly
    min(k, |group|) rows per group, inclusion probability ∝ weight —
    the Efraimidis–Spirakis reservoir scheme (key = u^(1/w), keep the
    k largest) made distributed and replayable.

    No RNG: u derives from the first 8 md5 hex chars of ``id_col``
    ((h + 0.5) / 2^32 — both the sum and the power-of-two division are
    EXACT in double, so u is bit-identical in any engine). Ranking uses
    the monotone-equivalent ln(u)/w (avoids cross-engine pow() ulp
    drift), rounded to 9 with the id as tiebreak so ordering is total.
    Plan: one scan + one row_number window per group — at 100 TB this
    is a single shuffle on the group key, versus the driver-side
    reservoir loop it replaces. Zero-weight rows are excluded (their
    E-S key is -inf)."""

    es_key = efraimidis_spirakis_key(id_col, weight_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_es_key").desc(), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", es_key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )


def skew_safe_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    *,
    salt_buckets: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT count-distinct that survives a hot group key.

    ``groupBy(k).agg(countDistinct(v))`` shuffles every (k, v) pair of
    a hot key into ONE reducer — partial aggregation can't help because
    distinct-ness isn't mergeable by count. This is the aggregation
    analogue of the skew join problem, and AQE's skew handling does not
    apply to aggregates.

    The classic fix is two-level: salt by ``hash(v) % S`` so each hot
    key's VALUE SPACE (not its rows) splits across S reducers. Stage 1
    counts distinct values within (k, hash-salt); because the salt is a
    pure function of the value, the per-salt value sets are DISJOINT,
    so stage 2's plain ``sum`` of the partial counts is exact — no
    approximation, unlike the approx_count_distinct escape hatch.
    Worst-case reducer load drops from |values(hot_k)| to
    |values(hot_k)| / S.

    Equivalence vs the direct plan is asserted in
    tests/test_cluster_range_ops.py::test_skew_safe_count_distinct_exact.
    """
    stage1 = (
        df.select(group_col, distinct_col)
        .withColumn(
            "_vsalt",
            F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_buckets)).cast(
                "int"
            ),
        )
        .groupBy(group_col, "_vsalt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return stage1.groupBy(group_col).agg(F.sum("_partial").alias(out_col))


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize both axes) without a
    single-partition window.

    A point p is ON the frontier iff no other point q has
    ``q.x <= p.x AND q.y <= p.y`` with at least one strict inequality.
    On DISTINCT points sorted by (x asc, y asc), that reduces to
    "y is strictly below the running min of y over all earlier points"
    — but a global ordered window is one reducer, the classic skyline
    scale trap.

    Two-level plan that holds at 100 TB:
      1. distinct (x, y) points, range-bucketed on x into ``buckets``
         ntiles (one shuffle; distinct-agg combines map-side);
      2. per-bucket min(y) → a ``buckets``-row table, running min over
         bucket order computed on this TINY table (broadcast back);
      3. within each bucket an ordered window over (x, y) seeds its
         running min from the PRIOR buckets' prefix min — buckets are
         processed in parallel, the only global pass is over the
         bucket-summary table.
    Dominance across buckets is exact because every point in an earlier
    x-bucket has x <= any point in a later bucket (range bucketing),
    so its y participates via the carried prefix min.

    Returns the distinct frontier points (x_col, y_col).
    """
    pts = df.select(x_col, y_col).dropna().distinct()
    # range-bucket on x: ntile over a sample would approximate; exact
    # range bucketing via percentile boundaries is overkill here —
    # hash-free range partitioning with repartitionByRange gives the
    # same contiguity guarantee, and spark_partition_id is the bucket.
    # localCheckpoint PINS one bucketing: repartitionByRange samples
    # fresh boundaries on EVERY consumption, and this frame feeds two
    # plans (per-bucket mins and the final window) — without the pin
    # they can see different _b assignments and the prefix mins join
    # against the wrong buckets.
    bucketed = (
        pts.repartitionByRange(buckets, F.col(x_col), F.col(y_col))
        .withColumn("_b", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per_bucket = bucketed.groupBy("_b").agg(F.min(y_col).alias("_bmin"))
    wb = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_bucket.select(
        "_b", F.min("_bmin").over(wb).alias("_prefix_min")
    )
    ww = (
        Window.partitionBy("_b")
        .orderBy(x_col, y_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(prefix), "_b")
        .withColumn(
            "_run_min",
            F.least(
                F.min(y_col).over(ww),
                F.col("_prefix_min"),
            ),
        )
        .filter(
            F.col("_run_min").isNull() | (F.col(y_col) < F.col("_run_min"))
        )
        .select(x_col, y_col)
    )


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "rn",
    buckets: int = 64,
) -> DataFrame:
    """Global 1-based row_number over a total order WITHOUT the
    single-partition window trap.

    ``row_number().over(Window.orderBy(...))`` collapses the whole
    table into one reducer — the most common accidental scale killer
    in ranking queries. The distributed classic instead:
      1. range-partition on the order columns (contiguous ranges,
         one shuffle — the same sort-shuffle a global orderBy does);
      2. count rows per range bucket (tiny summary table);
      3. exclusive prefix-sum the counts over bucket order (window on
         a ``buckets``-row table) and broadcast the offsets back;
      4. per-bucket row_number (parallel windows) + bucket offset.

    ``order_cols`` must form a TOTAL order (include a unique
    tie-break key): equal keys may straddle a range boundary, and
    within-bucket row_number over ties is nondeterministic.
    """
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint pins ONE set of sampled range boundaries: this
    # frame is consumed by both the bucket-count aggregation and the
    # final ranked join, and repartitionByRange re-samples (different
    # boundaries, different _b) on each consumption without it — the
    # offsets would then belong to a different bucketing than the
    # per-bucket row_numbers.
    bucketed = (
        df.repartitionByRange(buckets, *cols)
        .withColumn("_b", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = bucketed.groupBy("_b").agg(F.count("*").alias("_n"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_off")
    )
    ww = Window.partitionBy("_b").orderBy(*cols)
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn(
            out_col, (F.row_number().over(ww) + F.col("_off")).cast("long")
        )
        .drop("_b", "_off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "prefix_sum",
    buckets: int = 64,
) -> DataFrame:
    """Global INCLUSIVE running sum of ``value_col`` over a total order
    WITHOUT the single-partition window trap — the prefix-sum sibling
    of :func:`distributed_row_number` (same range-bucketed plan):

      1. range-partition on the order columns (one sort shuffle);
      2. per-bucket TOTAL of the value (tiny summary table);
      3. exclusive prefix-sum of bucket totals over bucket order,
         broadcast back;
      4. per-bucket cumulative window + bucket offset, in parallel.

    Exactness is the caller's contract: pass an integral or DECIMAL
    ``value_col`` (double partial sums would re-associate across
    buckets). ``order_cols`` must form a total order; ties straddling
    a range boundary make within-bucket cumsum order nondeterministic.
    The localCheckpoint pins one set of sampled range boundaries for
    the same two-consumer reason as distributed_row_number.
    """
    cols = [F.col(c) for c in order_cols]
    bucketed = (
        df.repartitionByRange(buckets, *cols)
        .withColumn("_b", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = bucketed.groupBy("_b").agg(F.sum(value_col).alias("_t"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_t").over(wb), F.lit(0)).alias("_off")
    )
    ww = (
        Window.partitionBy("_b")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, F.sum(value_col).over(ww) + F.col("_off"))
        .drop("_b", "_off")
    )
