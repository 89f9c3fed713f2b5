"""Streaming SimHash near-dup detection (round 3): the Python
fingerprint twin must equal the batch JVM operator bit-for-bit, and
the stateful band-verify must find cross-batch near-dups."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    dedup,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
    _simhash_py,
    stream_near_dup_pairs,
)


def test_python_fingerprint_matches_batch_operator(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    batch = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs).collect()
    }
    local = {
        r["doc_id"]: _simhash_py(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    assert batch == local


def test_stream_near_dup_cross_batch(spark, tmp_path):
    """Doc 2 (batch 0) and doc 12 (batch 1) are near-identical: the
    verified pair must be emitted when batch 1 arrives, with the
    earlier doc on the matched side. Unrelated docs emit nothing."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    src = tmp_path / "nd"
    src.mkdir()
    b0 = [
        {"doc_id": 1, "text": "completely different content about spark plans"},
        {"doc_id": 2, "text": base},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(d) for d in b0))
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = stream_near_dup_pairs(stream, max_hamming=3, bands=4)
    q = (
        out.writeStream.format("memory")
        .queryName("near_dups")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # second batch: a near-dup of doc 2 (one appended token — measured
    # hamming 1; a swapped repeated word moves 5 bits, too far) + noise
    b1 = [
        {"doc_id": 11, "text": "yet more unrelated text with other tokens"},
        {"doc_id": 12, "text": base + "extra"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(d) for d in b1))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select distinct doc_id, matched_doc_id, hamming from near_dups"
    ).collect()
    pairs = {(r["doc_id"], r["matched_doc_id"]) for r in rows}
    assert (12, 2) in pairs, f"expected (12, 2) in {pairs}"
    assert all(r["hamming"] <= 3 for r in rows)
    flat = {d for p in pairs for d in p}
    assert 1 not in flat and 11 not in flat


def test_stream_near_dup_matches_batch_pairs(spark, tmp_path):
    """One-batch stream over real docs == the batch banded pair set
    (modulo per-band emission multiplicity and pair orientation)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    batch_pairs = {
        frozenset((r["id_a"], r["id_b"]))
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3, bands=4).collect()
    }
    src = tmp_path / "full"
    src.mkdir()
    rows = docs.select("doc_id", "text").collect()
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) for r in rows
        )
    )
    stream = (
        spark.readStream.format("json")
        .schema("doc_id long, text string")
        .load(str(src))
    )
    out = stream_near_dup_pairs(stream, max_hamming=3, bands=4)
    q = (
        out.writeStream.format("memory")
        .queryName("near_dups_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckf"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_pairs = {
        frozenset((r["doc_id"], r["matched_doc_id"]))
        for r in spark.sql("select * from near_dups_full").collect()
    }
    assert stream_pairs == batch_pairs


def test_python_fingerprint_randomized_differential(spark):
    """Seeded adversarial texts — edge whitespace (Spark split keeps
    empty tokens at limit -1), tabs/newlines (Java ASCII \\s), U+00A0
    (NOT a separator in either engine), empty strings — must fingerprint
    identically in the Python twin and the JVM operator."""
    import random
    import string

    rng = random.Random(7)
    ws = " \t\n\x0b\f\r\xa0"
    cases = ["\tword alpha beta", "word alpha beta\t", "a\xa0b c",
             "  x y  ", "A B\nC", ""]
    for _ in range(60):
        n = rng.randint(1, 12)
        toks = [
            "".join(rng.choices(string.ascii_letters + string.digits + ".,!?",
                                k=rng.randint(1, 8)))
            for _ in range(n)
        ]
        seps = [rng.choice(ws) * rng.randint(1, 2) for _ in range(n)]
        cases.append(
            rng.choice(["", " ", "\t"])
            + "".join(t + s for t, s in zip(toks, seps))
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    jvm = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert len(jvm) == len(cases)
    for i, t in enumerate(cases):
        assert _simhash_py(t) == jvm[i], repr(t)


def test_incremental_near_dedup_two_batches(spark):
    """Batch-ingest twin of the streaming operator: batch-internal
    near-dups collapse to the min id, docs near a STORED signature are
    dropped, novel docs append to the store, and replaying a batch
    against the updated store yields zero fresh rows."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    other = "completely different subject matter entirely here with many words"
    b1 = spark.createDataFrame(
        [(1, base), (2, base + "extra"), (3, other)],
        "doc_id long, text string",
    )
    empty_store = spark.createDataFrame([], "doc_id long, simhash long")
    fresh1, delta1 = dedup.incremental_near_dedup(b1, empty_store)
    ids1 = {r["doc_id"] for r in fresh1.collect()}
    assert ids1 == {1, 3}  # 2 is a near-dup of 1 within the batch
    store = delta1
    # batch 2: near-dup of stored doc 1, plus a novel doc
    b2 = spark.createDataFrame(
        [(10, base + "extra"), (11, "novel content unseen before now")],
        "doc_id long, text string",
    )
    fresh2, delta2 = dedup.incremental_near_dedup(b2, store)
    assert {r["doc_id"] for r in fresh2.collect()} == {11}
    store = store.union(delta2)
    # replay batch 1: everything already represented in the store
    fresh3, _ = dedup.incremental_near_dedup(b1, store)
    assert fresh3.count() == 0


def test_streaming_gapfill_locf_matches_batch_semantics(spark, tmp_path):
    """Two micro-batches of hourly rows with holes: the streaming
    LOCF emits the dense series the batch gap-fill would produce for
    the same data — including a gap that SPANS the batch boundary
    (state carries the last mean across batches)."""
    import json as _json

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
        streaming_gapfill_locf,
    )

    src = tmp_path / "gf"
    src.mkdir()
    b0 = [
        {"event_type": "click", "hour": "2024-01-01 00:00:00", "n_events": 4, "hourly_avg": 2.0},
        {"event_type": "click", "hour": "2024-01-01 03:00:00", "n_events": 2, "hourly_avg": 5.0},
    ]
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in b0))

    schema = (
        "event_type string, hour timestamp, n_events long, hourly_avg double"
    )
    stream = spark.readStream.format("json").schema(schema).load(str(src))
    q = (
        streaming_gapfill_locf(stream)
        .writeStream.format("memory")
        .queryName("gapfill_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "gfck"))
        .start()
    )
    q.processAllAvailable()
    # second batch: next hour is 06:00 — the 04:00/05:00 gap spans the
    # batch boundary and must carry 5.0 forward from state
    b1 = [
        {"event_type": "click", "hour": "2024-01-01 06:00:00", "n_events": 1, "hourly_avg": 9.0},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in b1))
    q.processAllAvailable()
    q.stop()

    rows = sorted(
        (
            str(r["hour"]),
            r["n_events"],
            r["filled_avg"],
            r["is_gap"],
        )
        for r in spark.sql("select * from gapfill_out").collect()
    )
    assert rows == [
        ("2024-01-01 00:00:00", 4, 2.0, 0),
        ("2024-01-01 01:00:00", 0, 2.0, 1),
        ("2024-01-01 02:00:00", 0, 2.0, 1),
        ("2024-01-01 03:00:00", 2, 5.0, 0),
        ("2024-01-01 04:00:00", 0, 5.0, 1),
        ("2024-01-01 05:00:00", 0, 5.0, 1),
        ("2024-01-01 06:00:00", 1, 9.0, 0),
    ]
