"""SCD2 dimension-merge semantics and ORC format roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    layout,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources import (
    io,
)

from .conftest import SF_DIR_SMOKE


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, v string, valid_from date, valid_to date, is_current boolean"
    )


def test_scd2_merge_all_paths(spark):
    import datetime as dt

    d = dt.date
    current = _dim(
        spark,
        [
            # live rows
            (1, "a", d(1995, 1, 1), None, True),
            (2, "b", d(1995, 1, 1), None, True),
            (3, "c", d(1995, 1, 1), None, True),
            # history row for key 1 (must pass through untouched)
            (1, "old", d(1990, 1, 1), d(1995, 1, 1), False),
        ],
    )
    updates = spark.createDataFrame(
        [
            (1, "a"),  # equal -> no new version
            (2, "B2"),  # changed -> close + reopen
            (9, "new"),  # unseen key -> insert
        ],
        "k int, v string",
    )
    out = layout.scd2_merge(
        current,
        updates,
        key_cols=["k"],
        tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    rows = {(r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, "old", d(1990, 1, 1), d(1995, 1, 1), False),  # history untouched
        (1, "a", d(1995, 1, 1), None, True),  # no-change keeps version
        (2, "b", d(1995, 1, 1), d(1996, 6, 1), False),  # closed
        (2, "B2", d(1996, 6, 1), None, True),  # reopened
        (3, "c", d(1995, 1, 1), None, True),  # untouched live
        (9, "new", d(1996, 6, 1), None, True),  # insert
    }


def test_scd2_merge_null_tracked_value_is_a_change(spark):
    import datetime as dt

    d = dt.date
    current = _dim(spark, [(1, None, d(1995, 1, 1), None, True)])
    updates = spark.createDataFrame([(1, "x")], "k int, v string")
    out = layout.scd2_merge(
        current,
        updates,
        key_cols=["k"],
        tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    rows = {(r.k, r.v, r.is_current) for r in out.collect()}
    assert rows == {(1, None, False), (1, "x", True)}
    # null -> null is NOT a change (null-safe equality)
    updates_null = spark.createDataFrame(
        [(1, None)], "k int, v string"
    )
    out2 = layout.scd2_merge(
        current,
        updates_null,
        key_cols=["k"],
        tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    assert out2.count() == 1
    assert out2.filter(F.col("is_current")).count() == 1


def test_snapshot_diff_tags_and_filters(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, None), (5, "e")], "k int, v string"
    )
    out = layout.snapshot_diff(
        old, new, key_cols=["k"], compare_cols=["v"]
    )
    rows = {(r.k, r.change_type) for r in out.collect()}
    # 1 unchanged and 4 (null==null) produce no rows
    assert rows == {(2, "update"), (3, "delete"), (5, "insert")}


def test_weighted_sample_exact_k_deterministic_and_weight_sensitive(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.relational import (
        weighted_sample_per_group,
    )

    rows = [("g", i, 1) for i in range(100)] + [("g", 999, 10**9)] + [
        ("h", i, 1) for i in range(3)
    ] + [("h", 50, 0)]
    df = spark.createDataFrame(rows, "grp string, id int, w long")
    kept = weighted_sample_per_group(
        df, group_col="grp", id_col="id", weight_col="w", k=5
    )
    got = [(r.grp, r.id) for r in kept.collect()]
    per_group = {}
    for g, i in got:
        per_group.setdefault(g, set()).add(i)
    # exact k where the group is big enough, whole group otherwise
    assert len(per_group["g"]) == 5
    # zero-weight row excluded; only the 3 positive-weight rows remain
    assert per_group["h"] == {0, 1, 2}
    # the overwhelming weight is always selected (E-S key -> 0-)
    assert 999 in per_group["g"]
    # deterministic: a second run yields the identical set
    again = {
        (r.grp, r.id)
        for r in weighted_sample_per_group(
            df, group_col="grp", id_col="id", weight_col="w", k=5
        ).collect()
    }
    assert again == set(got)


def test_scd2_merge_replay_idempotent(spark):
    """Applying the SAME update batch twice yields the same dim — the
    property that makes the streaming foreachBatch sink safe under
    at-least-once batch replay."""
    import datetime as dt

    d = dt.date
    current = _dim(
        spark,
        [(1, "a", d(1995, 1, 1), None, True), (2, "b", d(1995, 1, 1), None, True)],
    )
    updates = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string")
    once = layout.scd2_merge(
        current, updates, key_cols=["k"], tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    twice = layout.scd2_merge(
        once, updates, key_cols=["k"], tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(once) == as_set(twice)


def test_streaming_scd2_dimension_maintenance(spark, tmp_path):
    """CDC stream → foreachBatch scd2_merge: two update files arrive as
    separate micro-batches; the final versioned dim matches applying
    the same batches with batch scd2_merge calls in order."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.cdc import (
        scd2_sink,
    )

    import datetime as dt

    d = dt.date
    dim_path = str(tmp_path / "dim")
    _dim(
        spark,
        [(1, "a", d(1995, 1, 1), None, True), (2, "b", d(1995, 1, 1), None, True)],
    ).write.parquet(dim_path)

    src = tmp_path / "updates"
    src.mkdir()
    schema = "k int, v string, effective_date string"

    def drain():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                scd2_sink(dim_path, key_cols=["k"], tracked_cols=["v"])
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    (src / "b0.json").write_text(
        '{"k": 1, "v": "a2", "effective_date": "1996-06-01"}\n'
    )
    drain()
    (src / "b1.json").write_text(
        '{"k": 1, "v": "a3", "effective_date": "1997-01-01"}\n'
        '{"k": 9, "v": "x", "effective_date": "1997-01-01"}\n'
    )
    drain()

    got = {tuple(r) for r in spark.read.parquet(dim_path).collect()}
    assert got == {
        (1, "a", d(1995, 1, 1), d(1996, 6, 1), False),
        (1, "a2", d(1996, 6, 1), d(1997, 1, 1), False),
        (1, "a3", d(1997, 1, 1), None, True),
        (2, "b", d(1995, 1, 1), None, True),
        (9, "x", d(1997, 1, 1), None, True),
    }


def test_scd2_merge_null_key_component_not_dropped(spark):
    """A null KEY component is a legal value under the eqNullSafe join
    and must not make rows vanish (presence is tracked by markers, not
    key nullability)."""
    import datetime as dt

    d = dt.date
    current = _dim(spark, [(None, "a", d(1995, 1, 1), None, True)])
    updates = spark.createDataFrame([(None, "b")], "k int, v string")
    out = layout.scd2_merge(
        current, updates, key_cols=["k"], tracked_cols=["v"],
        effective_date="1996-06-01",
    )
    rows = {(r.k, r.v, r.is_current) for r in out.collect()}
    assert rows == {(None, "a", False), (None, "b", True)}


def test_snapshot_diff_null_key_classification(spark):
    old = spark.createDataFrame([(None, "a"), (1, "x")], "k int, v string")
    # null-keyed row unchanged; key 1 deleted
    new = spark.createDataFrame([(None, "a")], "k int, v string")
    out = layout.snapshot_diff(old, new, key_cols=["k"], compare_cols=["v"])
    rows = {(r.k, r.change_type) for r in out.collect()}
    assert rows == {(1, "delete")}  # NOT a phantom insert for the null key


def test_scd2_sink_batch_with_duplicate_keys_last_wins(spark, tmp_path):
    """A CDC micro-batch carrying several events for one key must
    reduce last-wins before merging — not fan out duplicate current
    rows."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.cdc import (
        scd2_sink,
    )

    import datetime as dt

    d = dt.date
    dim_path = str(tmp_path / "dim")
    _dim(spark, [(1, "a", d(1995, 1, 1), None, True)]).write.parquet(dim_path)
    batch = spark.createDataFrame(
        [
            (1, "mid", "1996-01-01"),
            (1, "final", "1996-06-01"),  # later effective date wins
        ],
        "k int, v string, effective_date string",
    )
    scd2_sink(dim_path, key_cols=["k"], tracked_cols=["v"])(batch, 0)
    rows = {tuple(r) for r in spark.read.parquet(dim_path).collect()}
    assert rows == {
        (1, "a", d(1995, 1, 1), d(1996, 6, 1), False),
        (1, "final", d(1996, 6, 1), None, True),
    }
    # exactly one current row per key survived
    cur = [r for r in rows if r[4]]
    assert len(cur) == 1


def test_scd2_sink_empty_batch_still_repairs_crashed_commit(spark, tmp_path):
    """Crash window: merged was renamed in-progress — dim is MISSING and
    the ._scd2_prev set-aside exists. The repair must run even when the
    next (replayed) batch is EMPTY, so concurrent dim readers never
    wait for a non-empty batch (ADVICE r4)."""
    import os

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.cdc import (
        scd2_sink,
    )

    import datetime as dt

    d = dt.date
    dim_path = str(tmp_path / "dim")
    prev = dim_path + "._scd2_prev"
    _dim(spark, [(1, "a", d(1995, 1, 1), None, True)]).write.parquet(dim_path)
    # simulate the crash between the two commit renames
    os.rename(dim_path, prev)
    assert not os.path.exists(dim_path)
    empty = spark.createDataFrame(
        [], "k int, v string, effective_date string"
    )
    scd2_sink(dim_path, key_cols=["k"], tracked_cols=["v"])(empty, 1)
    # dim restored by the empty batch; contents intact
    rows = {tuple(r) for r in spark.read.parquet(dim_path).collect()}
    assert rows == {(1, "a", d(1995, 1, 1), None, True)}
    assert not os.path.exists(prev)


def test_orc_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    src = io.load_table(spark, SF_DIR_SMOKE, "nation")
    path = str(tmp_path / "nation_orc")
    io.write_orc(src, path)
    back = io.read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orc_partitioned_write_prunes_directories(spark, tmp_path):
    src = io.load_table(spark, SF_DIR_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    path = str(tmp_path / "orders_orc")
    io.write_orc(src, path, partition_by=["o_orderpriority"])
    back = io.read_orc(spark, path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning at
    # planning time), not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in pf
    expected = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == expected
