"""Bloom-filter index (operators/bloom_index.py) behavior tests.

The point of the index is pruning on UNCLUSTERED keys — every table
here is round-robin repartitioned so per-file [min,max] spans nearly
the whole key domain and the stats tier alone prunes nothing. The
pruning proofs are physical, in the house style: files the lookup plan
skips are OVERWRITTEN WITH GARBAGE before the read — if the engine
ever opened one, parquet footer parsing would throw.
"""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    bloom_index as bi,
    table_format as tf,
)


def _scattered(spark, lo, hi, n_files=8):
    """Keys lo..hi round-robin scattered over n_files files: min/max
    stats are useless, only the bloom tier can prune."""
    return spark.createDataFrame(
        [Row(k=i, name=f"name-{i}") for i in range(lo, hi)]
    ).repartition(n_files)


def _corrupt(root, adds):
    for a in adds:
        with open(os.path.join(root, a["path"]), "wb") as f:
            f.write(b"not parquet at all")


def test_lookup_matches_full_scan(spark, tmp_path):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 2000), root, stat_cols=["k"])
    bi.create_bloom_index(spark, root, "k")
    keys = [3, 777, 1999, 12345]  # last one absent
    got = sorted(
        (r["k"], r["name"])
        for r in bi.bloom_lookup(spark, root, "k", keys).collect()
    )
    want = sorted(
        (r["k"], r["name"])
        for r in tf.read_table(spark, root).filter(F.col("k").isin(keys)).collect()
    )
    assert got == want and len(got) == 3
    # all-absent lookup: zero rows, and the plan reads zero files
    assert bi.bloom_lookup(spark, root, "k", [10**9]).count() == 0


def test_bloom_prunes_scattered_files_physically(spark, tmp_path):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 4000, n_files=16), root, stat_cols=["k"])
    bi.create_bloom_index(spark, root, "k")
    live, _ = tf.snapshot_files(root)
    # stats tier is useless here: every file overlaps the probe key
    read, skipped = bi._lookup_plan(spark, root, "k", [1234])
    assert len(read) + len(skipped) == len(live)
    # one true file + (fpp ~0.07%) false positives: expect most skipped
    assert len(read) <= 3 and len(skipped) >= 13
    _corrupt(root, skipped)
    rows = bi.bloom_lookup(spark, root, "k", [1234]).collect()
    assert [(r["k"], r["name"]) for r in rows] == [(1234, "name-1234")]


def test_min_max_tier_short_circuits_before_sidecars(spark, tmp_path):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 100), root, stat_cols=["k"])
    bi.create_bloom_index(spark, root, "k")
    read, skipped = bi._lookup_plan(spark, root, "k", [500])
    assert read == [] and len(skipped) == len(tf.snapshot_files(root)[0])


def test_incremental_index_and_unindexed_always_read(spark, tmp_path):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 1000), root, stat_cols=["k"])
    v1 = bi.create_bloom_index(spark, root, "k")
    # idempotent: nothing left to index, no new commit
    assert bi.create_bloom_index(spark, root, "k") == v1
    tf.append(_scattered(spark, 1000, 1500, n_files=4), root)
    # unindexed appended files are always read (correctness first)
    rows = bi.bloom_lookup(spark, root, "k", [1250]).collect()
    assert [r["k"] for r in rows] == [1250]
    read, _ = bi._lookup_plan(spark, root, "k", [1250])
    assert sum(1 for a in read if "bloom" not in a) == 4
    # re-index covers ONLY the new files
    v3 = bi.create_bloom_index(spark, root, "k")
    rec = tf._read_commit(root, v3)
    assert rec["action"] == "index" and len(rec["add"]) == 4
    read2, _ = bi._lookup_plan(spark, root, "k", [1250])
    assert all("bloom" in a for a in read2) and len(read2) <= 3


def test_all_null_file_is_exactly_prunable(spark, tmp_path):
    root = str(tmp_path / "t")
    st = StructType(
        [StructField("k", LongType()), StructField("name", StringType())]
    )
    tf.create_table(
        spark.createDataFrame([(1, "a"), (2, "b")], st).coalesce(1),
        root,
        stat_cols=[],
    )
    tf.append(
        spark.createDataFrame([(None, "x"), (None, "y")], st).coalesce(1), root
    )
    bi.create_bloom_index(spark, root, "k")
    read, skipped = bi._lookup_plan(spark, root, "k", [1])
    assert len(read) == 1 and len(skipped) == 1
    _corrupt(root, skipped)
    assert bi.bloom_lookup(spark, root, "k", [1]).count() == 1


def test_time_travel_before_index_still_reads_everything(spark, tmp_path):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 500), root, stat_cols=["k"])
    bi.create_bloom_index(spark, root, "k")
    # version 0 predates the index commit: entries carry no bloom
    read, skipped = bi._lookup_plan(spark, root, "k", [42], version=0)
    assert skipped == [] and len(read) == len(tf.snapshot_files(root, 0)[0])
    assert bi.bloom_lookup(spark, root, "k", [42], version=0).count() == 1


def test_rewritten_files_lose_index_and_vacuum_reclaims_sidecars(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    tf.create_table(_scattered(spark, 0, 800), root, stat_cols=["k"])
    bi.create_bloom_index(spark, root, "k")
    n_sidecars = len(os.listdir(os.path.join(root, "index", "bloom")))
    assert n_sidecars >= 8
    tf.compact(spark, root, target_files=2)
    # compacted files are unindexed -> read, never wrongly skipped
    read, skipped = bi._lookup_plan(spark, root, "k", [7])
    assert skipped == [] and len(read) == 2
    tf.vacuum(root)  # drops the pre-compact data files
    gone = bi.vacuum_orphan_sidecars(root)
    assert len(gone) == n_sidecars
    bi.create_bloom_index(spark, root, "k")
    assert len(os.listdir(os.path.join(root, "index", "bloom"))) == 2
    assert bi.vacuum_orphan_sidecars(root) == []
