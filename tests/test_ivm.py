"""Incremental view maintenance (operators/ivm.py) behavior tests.

The invariant under test everywhere: after any source lineage and any
refresh schedule, ``read_rollup`` equals a full recompute
(``groupBy().agg(count, sum)``) over the source's current snapshot —
including NULL-sum fidelity (a group whose non-null inputs all departed
reports SUM = NULL, exactly as a recompute would) and group deletion
(n_rows reaching 0 removes the group). Refreshes must be
churn-proportional: the pruning proof corrupts untouched view files on
disk and the refresh still succeeds because it never opens them.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import Row, functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    ivm,
    table_format as tf,
)


def _mk(spark, lo, hi, seg="A", null_val_every=0):
    rows = []
    for i in range(lo, hi):
        val = None if null_val_every and i % null_val_every == 0 else i * 2
        rows.append(Row(k=i, g=i % 5, seg=seg, val=val))
    return spark.createDataFrame(rows, "k long, g long, seg string, val long")


def _recompute(spark, src_root, keys=("g",), sum_cols=("val",), minmax_cols=()):
    src = tf.read_table(spark, src_root)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return src.groupBy(*keys).agg(*aggs)


def _assert_rollup_matches(
    spark, src_root, view_root, keys=("g",), sum_cols=("val",), minmax_cols=()
):
    def _key(t):  # None-tolerant total order
        return tuple((v is None, v) for v in t)

    got = sorted(
        (tuple(r) for r in ivm.read_rollup(spark, view_root).collect()),
        key=_key,
    )
    want = sorted(
        (
            tuple(r)
            for r in _recompute(
                spark, src_root, keys, sum_cols, minmax_cols
            ).collect()
        ),
        key=_key,
    )
    assert got == want, f"view diverged from recompute:\n got {got}\nwant {want}"


def test_create_refresh_lineage_equals_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 50), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    _assert_rollup_matches(spark, src, view)
    assert "_nn_val" not in ivm.read_rollup(spark, view).columns

    tf.append(_mk(spark, 50, 80, seg="B"), src)
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)

    tf.delete_where(spark, src, "k < 20", prune_col="k")
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)

    updates = spark.createDataFrame(
        [Row(k=25, g=99, seg="Z", val=1000), Row(k=999, g=99, seg="Z", val=7)],
        "k long, g long, seg string, val long",
    )
    tf.merge_upsert(updates, src, key_col="k")
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)
    st = ivm.rollup_state(view)
    assert st["src_version"] == tf.latest_version(src) == 3


def test_multi_commit_fold_and_noop(spark, tmp_path):
    """One refresh folds several source commits; a refresh with no
    source progress commits nothing."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 30), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    tf.append(_mk(spark, 30, 40), src)
    tf.delete_where(spark, src, "k < 5", prune_col="k")
    tf.append(_mk(spark, 40, 45), src)
    v = ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)
    assert ivm.refresh_rollup(spark, view) == v  # no-op, no new commit
    assert tf.latest_version(view) == v


def test_compact_only_churn_is_metadata_noop(spark, tmp_path):
    """A source compaction rewrites files but changes no rows — the CDF
    cancels, and the refresh records the fold WITHOUT rewriting any
    view file (empty add/remove commit)."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 40).repartition(4), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    tf.compact(spark, src)
    v = ivm.refresh_rollup(spark, view)
    rec = tf._read_commit(view, v)
    assert rec["add"] == [] and rec["remove"] == []
    assert ivm.rollup_state(view)["src_version"] == tf.latest_version(src)
    _assert_rollup_matches(spark, src, view)


def test_group_deletion_and_null_sum_fidelity(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    # g=0 rows all have NULL val (k % 5 == 0 and null_val_every=5 align)
    tf.create_table(_mk(spark, 0, 25, null_val_every=5), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    rows = {r["g"]: r for r in ivm.read_rollup(spark, view).collect()}
    assert rows[0]["sum_val"] is None and rows[0]["n_rows"] == 5
    # delete every g=1 row: the group must disappear from the view
    tf.delete_where(spark, src, "k % 5 = 1")
    ivm.refresh_rollup(spark, view)
    rows = {r["g"]: r for r in ivm.read_rollup(spark, view).collect()}
    assert 1 not in rows and set(rows) == {0, 2, 3, 4}
    _assert_rollup_matches(spark, src, view)
    # delete the non-null val rows of g=2 (keep none): group g=2 gone;
    # then re-insert a NULL-val g=2 row: SUM must come back as NULL.
    tf.delete_where(spark, src, "g = 2")
    tf.append(
        spark.createDataFrame(
            [Row(k=1002, g=2, seg="N", val=None)],
            "k long, g long, seg string, val long",
        ),
        src,
    )
    ivm.refresh_rollup(spark, view)
    rows = {r["g"]: r for r in ivm.read_rollup(spark, view).collect()}
    assert rows[2]["n_rows"] == 1 and rows[2]["sum_val"] is None
    _assert_rollup_matches(spark, src, view)


def test_refresh_never_reads_pruned_view_files(spark, tmp_path):
    """Physical churn-proportionality proof: cluster the view on the
    group key, corrupt the view files outside the churned key range,
    refresh — it must succeed (never opens them) and carry them."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    rows = [Row(k=i, g=i // 100, seg="A", val=i) for i in range(1000)]
    tf.create_table(
        spark.createDataFrame(rows, "k long, g long, seg string, val long"),
        src,
        stat_cols=["k"],
    )
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    # cluster the view on g so per-file [min,max] ranges are disjoint
    tf.optimize_cluster(spark, view, ["g"], target_files=5)
    live, _ = tf.snapshot_files(view)
    untouched = [
        a for a in live
        if a["stats"]["g"][0] is not None and a["stats"]["g"][1] < 8
    ]
    assert untouched, "clustering should give files with max g < 8"
    before = {a["path"] for a in untouched}
    for a in untouched:
        with open(os.path.join(view, a["path"]), "wb") as f:
            f.write(b"NOT A PARQUET FILE")
    # churn confined to g in {8, 9}
    tf.delete_where(spark, src, "k >= 850", prune_col="k")
    v = ivm.refresh_rollup(spark, view)
    live1, _ = tf.snapshot_files(view, v)
    assert before <= {a["path"] for a in live1}  # carried by reference
    rec = tf._read_commit(view, v)
    assert before.isdisjoint(set(rec["remove"]))


def test_dim_churn_never_reads_pruned_fact_files(spark, tmp_path):
    """Physical proof for the ``F_old ⋈ ΔD`` scale claim: cluster the
    FACT on the join key, corrupt every fact file whose [min,max] fk
    range excludes the churned dim key, churn the dim at one key,
    refresh — the fold must succeed (stats-pruned fact read through
    bloom_lookup never opens the corrupted files)."""
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    view = str(tmp_path / "view")
    tf.create_table(
        spark.createDataFrame(
            [Row(k=i, fk=i // 100, val=i) for i in range(1000)],
            "k long, fk long, val long",
        ),
        fact,
        stat_cols=["fk"],
    )
    tf.optimize_cluster(spark, fact, ["fk"], target_files=5)
    tf.create_table(
        spark.createDataFrame(
            [Row(fk=i, dname=f"D{i}") for i in range(10)],
            "fk long, dname string",
        ),
        dim,
        stat_cols=["fk"],
    )
    ivm.create_rollup(
        spark, fact, view, keys=["dname"], sum_cols=["val"],
        dim_root=dim, dim_join_key="fk",
    )
    live, _ = tf.snapshot_files(fact)
    pruned = [
        a for a in live
        if a["stats"]["fk"][0] is not None and a["stats"]["fk"][1] < 8
    ]
    assert pruned, "clustering should give fact files with max fk < 8"
    for a in pruned:
        with open(os.path.join(fact, a["path"]), "wb") as f:
            f.write(b"NOT A PARQUET FILE")
    # dim attribute update confined to fk=9: D9 → D9x
    tf.delete_where(spark, dim, "fk = 9", prune_col="fk")
    tf.append(
        spark.createDataFrame([Row(fk=9, dname="D9x")], "fk long, dname string"),
        dim,
    )
    ivm.refresh_rollup(spark, view)  # must never open the corrupted files
    got = {
        r["dname"]: (r["n_rows"], r["sum_val"])
        for r in ivm.read_rollup(spark, view).collect()
    }
    assert "D9" not in got
    assert got["D9x"] == (100, sum(range(900, 1000)))


def test_composite_and_null_group_keys(spark, tmp_path):
    """NULL is a real group under groupBy semantics; composite keys are
    maintained null-safely and NULL-key churn disables pruning rather
    than corrupting the view."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    rows = [
        Row(k=i, g=(None if i % 7 == 0 else i % 3), seg=("X" if i % 2 else "Y"),
            val=i)
        for i in range(60)
    ]
    tf.create_table(
        spark.createDataFrame(rows, "k long, g long, seg string, val long"),
        src,
        stat_cols=["k"],
    )
    ivm.create_rollup(spark, src, view, keys=["g", "seg"], sum_cols=["val"])
    _assert_rollup_matches(spark, src, view, keys=("g", "seg"))
    tf.delete_where(spark, src, "k % 7 = 0")  # all NULL-g rows + k=0 etc.
    tf.append(
        spark.createDataFrame(
            [Row(k=1000 + i, g=None, seg="X", val=i) for i in range(5)],
            "k long, g long, seg string, val long",
        ),
        src,
    )
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view, keys=("g", "seg"))


def test_double_sums_match_to_tolerance(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    rows = [Row(k=i, g=i % 4, x=(i * 0.1) ** 2) for i in range(200)]
    tf.create_table(
        spark.createDataFrame(rows, "k long, g long, x double"), src,
        stat_cols=["k"],
    )
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["x"])
    tf.delete_where(spark, src, "k BETWEEN 50 AND 120", prune_col="k")
    tf.append(
        spark.createDataFrame(
            [Row(k=500 + i, g=i % 4, x=0.3 * i) for i in range(40)],
            "k long, g long, x double",
        ),
        src,
    )
    ivm.refresh_rollup(spark, view)
    got = {r["g"]: (r["n_rows"], r["sum_x"])
           for r in ivm.read_rollup(spark, view).collect()}
    want = {r["g"]: (r["n_rows"], r["sum_x"])
            for r in _recompute(spark, src, ("g",), ("x",)).collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], rel=1e-12)


def test_minmax_lineage_equals_recompute(spark, tmp_path):
    """MIN/MAX maintenance through inserts (least/greatest fold),
    extremum-displacing deletes (group-confined recompute), interior
    deletes, and updates that migrate a group's extremum."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    kw = dict(keys=("g",), sum_cols=("val",), minmax_cols=("val",))
    tf.create_table(_mk(spark, 0, 50, null_val_every=7), src, stat_cols=["k"])
    ivm.create_rollup(
        spark, src, view, keys=["g"], sum_cols=["val"], minmax_cols=["val"]
    )
    _assert_rollup_matches(spark, src, view, **kw)
    # insert-only: folds without touching the source
    tf.append(_mk(spark, 50, 70, seg="B"), src)
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view, **kw)
    # extremum-displacing delete: k=69 holds g=4's max val (138)
    tf.delete_where(spark, src, "k = 69")
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view, **kw)
    # interior delete: k=32 (val 64) is strictly inside g=2's [4, 134]
    tf.delete_where(spark, src, "k = 32")
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view, **kw)
    # update migrating an extremum via merge (delete+insert in the CDF)
    tf.merge_upsert(
        spark.createDataFrame(
            [Row(k=68, g=3, seg="U", val=-5)],
            "k long, g long, seg string, val long",
        ),
        src,
        key_col="k",
    )
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view, **kw)
    rows = {r["g"]: r for r in ivm.read_rollup(spark, view).collect()}
    assert rows[3]["min_val"] == -5


def test_minmax_insert_only_never_reads_source(spark, tmp_path):
    """Physical proof that an insert-only refresh stays off the source
    snapshot: corrupt every pre-existing source data file; the fold
    (which reads only the new commit's added files) must succeed."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 30), src, stat_cols=["k"])
    ivm.create_rollup(
        spark, src, view, keys=["g"], sum_cols=["val"], minmax_cols=["val"]
    )
    live0, _ = tf.snapshot_files(src, 0)
    tf.append(_mk(spark, 30, 45, seg="B"), src)
    for a in live0:
        with open(os.path.join(src, a["path"]), "wb") as f:
            f.write(b"NOT A PARQUET FILE")
    ivm.refresh_rollup(spark, view)  # must never open the corrupted files
    got = {r["g"]: (r["n_rows"], r["min_val"], r["max_val"])
           for r in ivm.read_rollup(spark, view).collect()}
    # g=0 rows: k in {0,5,...,25} ∪ {30,35,40}; val = 2k → extrema [0, 80]
    assert got[0] == (9, 0, 80)


def test_minmax_interior_delete_skips_recompute(spark, tmp_path):
    """A delete strictly inside every touched group's stored [min,max]
    must NOT trigger the recompute branch — proven physically by
    corrupting every source file the fold doesn't need (all but the
    delete commit's own add/remove set)."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(
        _mk(spark, 0, 100).repartitionByRange(4, "k"), src, stat_cols=["k"]
    )
    ivm.create_rollup(
        spark, src, view, keys=["g"], sum_cols=["val"], minmax_cols=["val"]
    )
    # k in [40, 60): interior of every g group (extrema live at k<5, k>=95)
    tf.delete_where(spark, src, "k >= 40 AND k < 60", prune_col="k")
    rec = tf._read_commit(src, 1)
    needed = {a["path"] for a in rec["add"]} | set(rec["remove"])
    live1, _ = tf.snapshot_files(src, 1)
    for a in live1:
        if a["path"] not in needed:
            with open(os.path.join(src, a["path"]), "wb") as f:
                f.write(b"NOT A PARQUET FILE")
    ivm.refresh_rollup(spark, view)  # recompute would open corrupted files
    got = {r["g"]: (r["min_val"], r["max_val"])
           for r in ivm.read_rollup(spark, view).collect()}
    assert got[0] == (0, 190) and got[4] == (8, 198)


def test_maintained_sink_medallion_replay_idempotent(spark, tmp_path):
    """bronze→silver in one foreachBatch: each batch lands in the source
    table and the rollup view folds forward; a replayed batch id is a
    no-op at BOTH layers (source ledger + src_version guard)."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 20), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    sink = ivm.maintained_sink(src, [view])
    sink(_mk(spark, 20, 35, seg="B"), 0)
    _assert_rollup_matches(spark, src, view)
    src_head, view_head = tf.latest_version(src), tf.latest_version(view)
    sink(_mk(spark, 20, 35, seg="B"), 0)  # crash-replay of batch 0
    assert tf.latest_version(src) == src_head
    assert tf.latest_version(view) == view_head
    sink(_mk(spark, 35, 40, seg="C"), 1)
    _assert_rollup_matches(spark, src, view)
    # CDC flavor: merge on k, group migration g: k%5 -> fixed 42
    cdc = ivm.maintained_sink(src, [view], key_col="k")
    cdc(
        spark.createDataFrame(
            [Row(k=22, g=42, seg="U", val=7), Row(k=900, g=42, seg="U", val=8)],
            "k long, g long, seg string, val long",
        ),
        2,
    )
    _assert_rollup_matches(spark, src, view)


def test_star_rollup_folds_both_sides(spark, tmp_path):
    """Star-schema rollup (fact ⋈ dim, grouped by a dim attribute):
    BOTH delta-join summands fold incrementally — fact churn against
    the dim's new head (including an extremum-displacing delete whose
    group-confined recompute re-joins the new dim), and dim churn as
    ``F_old ⋈ ΔD`` (a dim insert that lights up previously-unmatched
    fact rows, an attribute update that migrates whole groups, and a
    dim delete that empties a group)."""
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    view = str(tmp_path / "view")
    tf.create_table(
        spark.createDataFrame(
            [Row(k=i, fk=i % 4, val=i * 10) for i in range(40)],
            "k long, fk long, val long",
        ),
        fact,
        stat_cols=["k"],
    )
    tf.create_table(
        spark.createDataFrame(
            [Row(fk=i, dname=f"D{i % 2}") for i in range(3)],  # fk=3 unmatched
            "fk long, dname string",
        ),
        dim,
        stat_cols=["fk"],
    )
    ivm.create_rollup(
        spark, fact, view,
        keys=["dname"], sum_cols=["val"], minmax_cols=["val"],
        dim_root=dim, dim_join_key="fk",
    )

    def want():
        f = tf.read_table(spark, fact)
        d = tf.read_table(spark, dim)
        return {
            r["dname"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in f.join(d, "fk")
            .groupBy("dname")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("val").alias("s"),
                F.min("val").alias("mn"),
                F.max("val").alias("mx"),
            )
            .collect()
        }

    def got():
        return {
            r["dname"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in ivm.read_rollup(spark, view).collect()
        }

    assert got() == want()
    # fact churn: inserts (some unmatched fk=7 rows must NOT count),
    # then an extremum-displacing delete (k=38 holds D0's max 380)
    tf.append(
        spark.createDataFrame(
            [Row(k=100 + i, fk=(7 if i % 3 == 0 else i % 3), val=1000 + i)
             for i in range(9)],
            "k long, fk long, val long",
        ),
        fact,
    )
    ivm.refresh_rollup(spark, view)
    assert got() == want()
    tf.delete_where(spark, fact, "k >= 100")  # drops every 1000+ extremum
    ivm.refresh_rollup(spark, view)
    assert got() == want()
    # both sides churn before ONE refresh: the dim insert (fk=3 — its
    # ~13 pre-existing fact rows were unmatched until now) folds via
    # F_old ⋈ ΔD, and the new fact row joins the NEW dim row via the
    # ΔF ⋈ D_new summand (the cross term).
    tf.append(
        spark.createDataFrame([Row(fk=3, dname="D9")], "fk long, dname string"),
        dim,
    )
    tf.append(
        spark.createDataFrame([Row(k=999, fk=3, val=5)], "k long, fk long, val long"),
        fact,
    )
    ivm.refresh_rollup(spark, view)
    assert got() == want()
    # dim attribute update (delete + insert at the same key): every
    # fk=0 fact row migrates D0 → D7; D0's survivors shrink, and the
    # departed rows held D0 extrema so the group recompute fires too.
    tf.delete_where(spark, dim, "fk = 0", prune_col="fk")
    tf.append(
        spark.createDataFrame([Row(fk=0, dname="D7")], "fk long, dname string"),
        dim,
    )
    ivm.refresh_rollup(spark, view)
    assert got() == want()
    # dim delete that empties a whole group: D9's only member departs.
    tf.delete_where(spark, dim, "fk = 3", prune_col="fk")
    ivm.refresh_rollup(spark, view)
    assert got() == want()
    assert "D9" not in got()
    # dim-only churn with no fact commit still advances the fold pin:
    # the next refresh is a pure no-op (no replay, no new data files).
    st = ivm.rollup_state(view)
    assert st["dim"]["version"] == tf.latest_version(dim)
    v_before = tf.latest_version(view)
    assert ivm.refresh_rollup(spark, view) == v_before


def test_avg_and_distinct_count_maintenance(spark, tmp_path):
    """Derived AVG (sum over stored non-null count) and exact
    COUNT(DISTINCT) via the support-table aux view both track a full
    recompute through delete/merge churn."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    aux = str(tmp_path / "aux")
    tf.create_table(_mk(spark, 0, 60, null_val_every=6), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    ivm.create_distinct_rollup(spark, src, aux, keys=["g"], distinct_col="seg")
    tf.append(_mk(spark, 60, 80, seg="B", null_val_every=4), src)
    tf.delete_where(spark, src, "k BETWEEN 10 AND 30", prune_col="k")
    tf.merge_upsert(
        spark.createDataFrame(
            [Row(k=45, g=0, seg="C", val=None),
             Row(k=500, g=0, seg="C", val=12)],
            "k long, g long, seg string, val long",
        ),
        src,
        key_col="k",
    )
    ivm.refresh_rollup(spark, view)
    ivm.refresh_rollup(spark, aux)
    source = tf.read_table(spark, src)
    want_avg = {
        r["g"]: r["a"]
        for r in source.groupBy("g").agg(F.avg("val").alias("a")).collect()
    }
    got_avg = {
        r["g"]: r["avg_val"]
        for r in ivm.read_rollup(spark, view, with_avg=True).collect()
    }
    assert set(got_avg) == set(want_avg)
    for g in want_avg:
        if want_avg[g] is None:
            assert got_avg[g] is None
        else:
            assert got_avg[g] == pytest.approx(want_avg[g], rel=1e-12)
    want_d = {
        r["g"]: r["d"]
        for r in source.groupBy("g")
        .agg(F.countDistinct("seg").alias("d"))
        .collect()
    }
    got_d = {
        r["g"]: r["countd_seg"]
        for r in ivm.read_distinct_counts(spark, aux).collect()
    }
    assert got_d == want_d


def test_random_op_sequence_maintenance(spark, tmp_path):
    """Model-based: random append/delete/merge/compact lineage with
    refreshes interleaved at random points — the view must equal the
    recompute at every refresh."""
    rng = random.Random(71)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    next_k = 80
    tf.create_table(_mk(spark, 0, next_k, null_val_every=9), src,
                    stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    for step in range(8):
        op = rng.choice(["append", "delete", "merge", "compact"])
        if op == "append":
            n = rng.randrange(5, 30)
            tf.append(
                _mk(spark, next_k, next_k + n,
                    null_val_every=rng.choice([0, 4])),
                src,
            )
            next_k += n
        elif op == "delete":
            lo = rng.randrange(0, next_k)
            tf.delete_where(
                spark, src, f"k BETWEEN {lo} AND {lo + 25}", prune_col="k"
            )
        elif op == "merge":
            ks = rng.sample(range(next_k + 40), 12)
            tf.merge_upsert(
                spark.createDataFrame(
                    [Row(k=k, g=k % 6, seg="M",
                         val=(None if k % 5 == 0 else k * 3)) for k in ks],
                    "k long, g long, seg string, val long",
                ),
                src,
                key_col="k",
            )
        else:
            tf.compact(spark, src)
        if rng.random() < 0.7 or step == 7:
            ivm.refresh_rollup(spark, view)
            _assert_rollup_matches(spark, src, view)


def test_rollup_folds_deletion_vector_churn(spark, tmp_path):
    """Composition of the two lakehouse tiers: merge-on-read DV deletes
    on the SOURCE flow through the change feed into the rollup exactly
    like copy-on-write deletes — including a restore that resurrects
    them (the view re-folds the restore commit's logical diff)."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 60, null_val_every=7), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    v_pre = tf.latest_version(src)
    tf.delete_where(spark, src, "k BETWEEN 10 AND 24", prune_col="k",
                    mode="mor")
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)
    tf.delete_where(spark, src, "k % 9 = 0", mode="mor")  # cumulative
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)
    # restore the source to the pre-delete snapshot: the CDF reports
    # the masked rows as re-inserted and the view folds them back.
    tf.restore_table(src, v_pre)
    ivm.refresh_rollup(spark, view)
    _assert_rollup_matches(spark, src, view)


def test_concurrent_refreshers_never_double_fold(spark, tmp_path):
    """Two refresher threads race each other AND a live writer: every
    fold must be applied exactly once. The documented contract
    (refresh_rollup docstring) is that a racing refresh that already
    folded the head turns the loser into a no-op — a double-applied
    delta would shift counts/sums and break the recompute equality."""
    import threading

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 40), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])

    errors: list[BaseException] = []
    done = threading.Event()

    def writer() -> None:
        try:
            for step in range(4):
                lo = 40 + step * 20
                tf.append(_mk(spark, lo, lo + 20, seg="B"), src,
                          max_retries=30)
            tf.delete_where(spark, src, "k < 15", prune_col="k",
                            max_retries=30)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            done.set()

    def refresher() -> None:
        try:
            while not done.is_set():
                ivm.refresh_rollup(spark, view, max_retries=30)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=refresher) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"thread failed: {errors[0]!r}"

    # final catch-up fold, then exact equality with a recompute
    ivm.refresh_rollup(spark, view)
    got = {
        r["g"]: (r["n_rows"], r["sum_val"])
        for r in ivm.read_rollup(spark, view).collect()
    }
    want = {
        r["g"]: (r["n_rows"], r["sum_val"])
        for r in _recompute(spark, src).collect()
    }
    assert got == want, (got, want)
    # every view commit advanced the folded src_version monotonically —
    # a double-fold would repeat one
    folded = []
    for v in range(tf.latest_version(view) + 1):
        rec = tf._read_commit(view, v)
        if "ivm" in rec:
            folded.append(rec["ivm"]["src_version"])
    assert folded == sorted(set(folded)), folded


def test_racing_partial_fold_never_double_applies(spark, tmp_path):
    """The stale-plan hazard: refresh A plans the delta for (0, 2];
    racer B (which started earlier) folds only (0, 1] and commits
    first. A's pinned delta OVERLAPS what B applied — a naive retry
    would re-add (0, 1] and corrupt every count/sum. A must detect the
    moved fold base and rebuild from fresh state (_plan_stale)."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    tf.create_table(_mk(spark, 0, 20), src, stat_cols=["k"])
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    tf.append(_mk(spark, 20, 30, seg="B"), src)  # src v1
    tf.append(_mk(spark, 30, 40, seg="C"), src)  # src v2

    real_write = tf._write_commit
    real_latest = tf.latest_version
    state = {"raced": False}

    def racing(r, v, rec):
        if (rec.get("action") == "ivm_refresh" and r == view
                and not state["raced"]):
            state["raced"] = True
            # racer B: planned when the src head was still v1, so its
            # refresh folds only (0, 1] — pin latest_version for src
            tf._write_commit = real_write

            def pinned(root_):
                return 1 if root_ == src else real_latest(root_)

            tf.latest_version = pinned
            try:
                ivm.refresh_rollup(spark, view)
            finally:
                tf.latest_version = real_latest
            tf._write_commit = racing
        real_write(r, v, rec)

    tf._write_commit = racing
    try:
        ivm.refresh_rollup(spark, view)
    finally:
        tf._write_commit = real_write

    got = {
        r["g"]: (r["n_rows"], r["sum_val"])
        for r in ivm.read_rollup(spark, view).collect()
    }
    want = {
        r["g"]: (r["n_rows"], r["sum_val"])
        for r in _recompute(spark, src).collect()
    }
    assert got == want, (got, want)
    # the folded src_version chain must be STRICTLY monotone
    folded = []
    for v in range(tf.latest_version(view) + 1):
        rec = tf._read_commit(view, v)
        if "ivm" in rec:
            folded.append(rec["ivm"]["src_version"])
    assert folded == sorted(set(folded)), folded
    assert folded[-1] == 2


def test_rollup_sum_survives_long_overflow_volumes(spark, tmp_path):
    """r9 sf1 scale-proof finding: integral SUM measures must route
    through DECIMAL(38,0) — a LONG sum of key-sized values overflows
    signed 64 bits at 100 TB volumes and ANSI mode aborts the refresh.
    A 3-row group of ~0.43*Long.MAX values overflows a long sum at
    CREATE time, and the refresh fold overflows again; the widened
    rollup must create, refresh through churn, and stay exact."""
    from decimal import Decimal

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    big = 4_000_000_000_000_000_000  # ~0.43 * Long.MAX
    # group 0 holds THREE big rows at create: 3*big = 1.2e19 > Long.MAX,
    # so the CREATE path itself overflows a long sum (not just the
    # later refresh fold) — remove _widen from _rollup_frame and this
    # first assertion aborts with ARITHMETIC_OVERFLOW under ANSI.
    rows = [Row(k=0, g=0, val=big), Row(k=1, g=0, val=big),
            Row(k=2, g=0, val=big), Row(k=3, g=1, val=big)]
    tf.create_table(
        spark.createDataFrame(rows, "k long, g long, val long"),
        src,
        stat_cols=["k"],
    )
    ivm.create_rollup(spark, src, view, keys=["g"], sum_cols=["val"])
    got = {
        r["g"]: r["sum_val"]
        for r in ivm.read_rollup(spark, view).collect()
    }
    assert got == {0: Decimal(3 * big), 1: Decimal(big)}
    # churn: the delta fold must widen too (sign * val in long would
    # still be fine, but the SUM of deltas must not overflow)
    tf.append(
        spark.createDataFrame(
            [Row(k=10 + i, g=0, val=big) for i in range(3)],
            "k long, g long, val long",
        ),
        src,
    )
    ivm.refresh_rollup(spark, view)
    got = {
        r["g"]: r["sum_val"]
        for r in ivm.read_rollup(spark, view).collect()
    }
    assert got == {0: Decimal(6 * big), 1: Decimal(big)}


def test_with_avg_keeps_native_decimal_measures_exact(spark, tmp_path):
    """r9 review pass: the widening→double cast for derived avgs keys
    off the SPEC's widened_cols list, not the stored sum type — a
    natively decimal(p,0) measure (NOT widened) must keep its exact
    decimal avg even when its sum exceeds double's 2^53 integer range,
    while a widened integral measure casts back to Spark's DOUBLE avg
    type."""
    from decimal import Decimal

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    big = 10_000_000_000_000_000_001  # 1e19 + 1: not a double integer
    rows = spark.createDataFrame(
        [(0, 0, Decimal(big), 7), (1, 0, Decimal(big), 9)],
        "k long, g long, dval decimal(20,0), ival long",
    )
    tf.create_table(rows, src, stat_cols=["k"])
    ivm.create_rollup(
        spark, src, view, keys=["g"], sum_cols=["dval", "ival"]
    )
    st = ivm.rollup_state(view)
    assert st["widened_cols"] == ["ival"]
    row = ivm.read_rollup(spark, view, with_avg=True).collect()[0]
    # native decimal: exact — a double round-trip would land on 1e19
    assert row["avg_dval"] == Decimal(big)
    # widened integral: Spark's avg-over-integral DOUBLE semantics
    assert isinstance(row["avg_ival"], float) and row["avg_ival"] == 8.0
