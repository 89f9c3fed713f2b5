"""Tolerance contract for the approx-percentile scale path: the
runnable 100 TB variant (mergeable sketch + broadcast clip) must land
within sketch accuracy of the exact interpolated-percentile twin."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


def _by_type(rows):
    return {r["event_type"]: r.asDict() for r in rows}


def test_winsorized_approx_tracks_exact(spark):
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        q_winsorized_value_stats,
        q_winsorized_value_stats_approx,
    )

    exact = _by_type(q_winsorized_value_stats(spark, SF_DIR).collect())
    approx = _by_type(q_winsorized_value_stats_approx(spark, SF_DIR).collect())
    assert set(exact) == set(approx)
    for et in exact:
        e, a = exact[et], approx[et]
        assert a["n_events"] == e["n_events"]
        spread = e["p95"] - e["p05"]
        # accuracy=10000 -> rank error ~1e-4; allow 2% of the band
        assert abs(a["p05"] - e["p05"]) <= 0.02 * spread, (et, e, a)
        assert abs(a["p95"] - e["p95"]) <= 0.02 * spread, (et, e, a)
        # clip counts move by at most the rank tolerance of the sketch
        for k in ("n_clipped_low", "n_clipped_high"):
            assert abs(a[k] - e[k]) <= max(5, 0.01 * e["n_events"]), (et, k, e, a)


def test_approx_percentile_price_quantiles_tolerance(spark):
    """Same contract for the orders-price quantiles: the documented
    approx swap must stay within sketch tolerance of quantile_cont."""
    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        q_quantiles_price_by_priority,
        _t,
    )

    exact = {
        r["o_orderpriority"]: r.asDict()
        for r in q_quantiles_price_by_priority(spark, SF_DIR).collect()
    }
    orders = _t(spark, SF_DIR, "orders")
    approx = {
        r["o_orderpriority"]: r.asDict()
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("p50"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("p90"),
        )
        .collect()
    }
    for pri in exact:
        for k, q in (("p50", 0.5), ("p90", 0.9)):
            e, a = float(exact[pri][k]), float(approx[pri][k])
            assert abs(a - e) / e < 0.02, (pri, k, e, a)
