"""mapInArrow kernel vs native-expression twin equivalence."""

from __future__ import annotations

import math

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.arrow_ops import (
    normalize_embeddings_arrow,
    normalize_embeddings_native,
)

SF = "/root/testdata/sf0.001"


def test_arrow_normalize_matches_native(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = {
        r["vec_id"]: (r["unit"], r["norm"])
        for r in normalize_embeddings_arrow(emb).collect()
    }
    n = {
        r["vec_id"]: (r["unit"], r["norm"])
        for r in normalize_embeddings_native(emb).collect()
    }
    assert a.keys() == n.keys() and len(a) > 0
    for k in a:
        ua, na_ = a[k]
        un, nn = n[k]
        assert abs(na_ - nn) < 1e-9
        assert len(ua) == len(un)
        assert all(abs(x - y) < 1e-6 for x, y in zip(ua, un))
        # actually unit-length
        assert abs(math.sqrt(sum(x * x for x in ua)) - 1.0) < 1e-5


def test_arrow_normalize_zero_vector_total(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["unit"], r["norm"])
        for r in normalize_embeddings_arrow(df).collect()
    }
    assert out[1][1] == 0.0 and out[1][0] == [0.0, 0.0, 0.0]
    assert abs(out[2][1] - 5.0) < 1e-9
    assert abs(out[2][0][0] - 0.6) < 1e-6


def test_apply_in_arrow_centroids_match_native(spark):
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.arrow_ops import (
        label_centroids_arrow,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r["label"]: (r["n_vectors"], r["centroid"], r["mean_norm"])
        for r in label_centroids_arrow(emb).collect()
    }
    # native twin: explode dims, average per (label, dim), reassemble
    native = (
        emb.select(
            "label", F.posexplode("embedding").alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("m"), (F.count("*")).alias("n"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("dims"),
            F.max("n").alias("n_vectors"),
        )
        .select(
            "label",
            "n_vectors",
            F.transform(F.col("dims"), lambda s: s["m"]).alias("centroid"),
        )
    )
    want = {
        r["label"]: (r["n_vectors"], r["centroid"]) for r in native.collect()
    }
    assert got.keys() == want.keys() and len(got) > 1
    for k in got:
        n_a, cent_a, mn = got[k]
        n_b, cent_b = want[k]
        assert n_a == n_b and mn > 0
        assert len(cent_a) == len(cent_b)
        assert all(abs(x - y) < 1e-9 for x, y in zip(cent_a, cent_b))


def test_arrow_normalize_rejects_null_embeddings(spark):
    """A null list element must raise a named ValueError, not trip an
    assert (stripped under -O) or silently misalign the reshape."""
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception) as exc_info:
        normalize_embeddings_arrow(df).collect()
    assert "null embedding" in str(exc_info.value)


def test_arrow_normalize_rejects_ragged_embeddings(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0, 5.0])],
        "vec_id long, embedding array<float>",
    ).coalesce(1)  # raggedness is checked per Arrow batch
    with pytest.raises(Exception) as exc_info:
        normalize_embeddings_arrow(df).collect()
    assert "ragged" in str(exc_info.value)
