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
