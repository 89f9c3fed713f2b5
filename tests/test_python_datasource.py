"""Custom Python DataSource: determinism, parallelism, pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
    StringStartsWith,
)

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
    SyntheticDocsReader,
    register_synthetic_source,
)


def _load(spark, **opts):
    register_synthetic_source(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_deterministic_and_partition_parallel(spark):
    df = _load(spark, n_docs=500, n_partitions=8, seed=11)
    assert df.count() == 500
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _load(spark, n_docs=500, n_partitions=3, seed=11).collect())
    # content independent of partitioning — any worker regenerates any range
    assert a == b
    assert df.rdd.getNumPartitions() == 8


def test_planted_duplicates_exact_rate(spark):
    df = _load(spark, n_docs=500, dup_every=5)
    dups = (
        df.groupBy("text").count().filter(F.col("count") > 1).count()
    )
    # every 5th doc repeats its predecessor: 100 duplicated texts
    assert dups == 100


def test_filter_pushdown_narrows_generated_range(spark):
    df = _load(spark, n_docs=10_000).filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    )
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(100, 150))


def test_push_filters_contract_unit():
    r = SyntheticDocsReader({"n_docs": "1000"})
    remaining = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 10),
                LessThan(("doc_id",), 20),
                StringStartsWith(("lang",), "e"),  # not absorbable
            ]
        )
    )
    assert (r.lo, r.hi) == (10, 20)
    assert remaining == [StringStartsWith(("lang",), "e")]
    parts = r.partitions()
    covered = sorted((p.lo, p.hi) for p in parts)
    assert covered[0][0] == 10 and covered[-1][1] == 20
    # equality pin
    r2 = SyntheticDocsReader({"n_docs": "1000"})
    list(r2.pushFilters([EqualTo(("doc_id",), 42)]))
    assert (r2.lo, r2.hi) == (42, 43)


def test_stream_source_emits_contiguous_batches(spark, tmp_path):
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("docs_per_batch", 50)
        .option("max_docs", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("syn_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(
        r["doc_id"] for r in spark.sql("select * from syn_stream").collect()
    )
    # drains exactly at the cap: 120 docs over 50/50/20 batches
    assert ids == list(range(120))
    # stream content identical to the batch source at the same ids
    batch = {
        r["doc_id"]: r["text"]
        for r in _load(spark, n_docs=len(ids)).collect()
    }
    stream_rows = {
        r["doc_id"]: r["text"]
        for r in spark.sql("select * from syn_stream").collect()
    }
    assert stream_rows == batch


def test_stream_source_replay_exact():
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.synthetic import (
        SyntheticDocsStreamReader,
    )

    r = SyntheticDocsStreamReader({"docs_per_batch": "25"})
    rows, end = r.read(r.initialOffset())
    first = list(rows)
    assert end == {"doc_id": 25} and len(first) == 25
    replay = list(r.readBetweenOffsets({"doc_id": 0}, {"doc_id": 25}))
    assert replay == first


def test_synthetic_source_feeds_dedup_at_scale(spark):
    """The source's purpose: a 20k-doc corpus with a KNOWN duplicate
    rate generated partition-parallel, flowing straight into the exact
    dedup operator — keep-count is exactly predictable: every 5th doc
    duplicates its predecessor, so 4 of every 5 texts are canonical."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.dedup import (
        dedup_exact,
    )

    df = _load(spark, n_docs=20_000, n_partitions=16, dup_every=5)
    kept = dedup_exact(df)
    n_kept = kept.count()
    # 4000 pairs (i, i+1) share text -> 16000 distinct texts, unless
    # two different content_ids hash-collide into equal text (possible:
    # short docs over a 20-word vocab). Allow that slack only downward.
    assert 15_800 <= n_kept <= 16_000
    # every planted duplicate really is a duplicate
    two_plus = kept.filter(F.col("dup_count") >= 2).count()
    assert two_plus <= 4000
    total = kept.agg(F.sum("dup_count")).collect()[0][0]
    assert total == 20_000


def test_stream_source_feeds_near_dup_detector(spark, tmp_path):
    """Ground-truth streaming dedup: the synthetic stream's planted
    exact duplicates (doc i duplicates i-1 when i % 5 == 4) MUST all be
    flagged by the stateful SimHash detector — identical text means
    hamming 0, and the pigeonhole banding cannot miss distance-0 pairs
    that arrive in different micro-batches or the same one."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
        rocksdb_state,
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
        stream_near_dup_pairs,
    )

    register_synthetic_source(spark)
    with rocksdb_state(spark, unload_on_commit=True):
        stream = (
            spark.readStream.format("synthetic_docs")
            .option("docs_per_batch", 40)
            .option("max_docs", 200)
            .load()
        )
        q = (
            stream_near_dup_pairs(stream)
            .writeStream.format("memory")
            .queryName("syn_neardup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    pairs = {
        tuple(sorted((r["doc_id"], r["matched_doc_id"])))
        for r in spark.sql("select * from syn_neardup").collect()
    }
    planted = {(i - 1, i) for i in range(200) if i % 5 == 4}
    missed = planted - pairs
    assert not missed, f"planted duplicates not detected: {sorted(missed)[:5]}"
    # every planted pair is hamming 0
    zero = {
        tuple(sorted((r["doc_id"], r["matched_doc_id"])))
        for r in spark.sql(
            "select * from syn_neardup where hamming = 0"
        ).collect()
    }
    assert planted <= zero
