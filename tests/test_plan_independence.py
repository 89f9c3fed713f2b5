"""Plan-independence certificates for the r10 de-hint sweep.

The sweep removed explicit broadcast hints from SF-growing join sides
(commit "Remove broadcast hints from SF-growing join sides"), on the
argument that AQE keeps the broadcast plan at test SF and a shuffle
join replaces it at 100 TB *without changing results*. That second
half is only true if no value in the output depends on partitioning —
the classic failure is a double sum whose partial-aggregation order
differs between a broadcast-hash and a sort-merge plan. The repo's
defense is the exact-decimal routing convention (_dsum /
_revenue_dec / decimal quantization before float division); this test
certifies it END-TO-END: every de-hinted or window-converted query
must return BIT-IDENTICAL rows under

  (a) the default session (AQE broadcast at this SF, 32 shuffle
      partitions), and
  (b) a forced worst-case re-plan: autoBroadcastJoinThreshold=-1
      (every equi-join becomes shuffle) AND shuffle.partitions=7
      (different partial-agg grouping on every exchange).

A float that wobbles between (a) and (b) at sf0.01 is exactly the
float that silently diverges between the test cluster and the 100 TB
cluster.

SERIAL-ONLY ASSUMPTION (ADVICE r10): the forced re-plan mutates the
SHARED SparkSession conf (autoBroadcastJoinThreshold /
shuffle.partitions) around a collect and restores it in a finally —
correct while pytest runs this module serially (the repo's setup; no
xdist configured), but any concurrently executing test sharing the
session would observe the worst-case config mid-run. If pytest-xdist
is ever enabled, give this module a dedicated SparkSession fixture
instead of the shared one.
"""

from __future__ import annotations

import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)

from .conftest import SF_DIR_CORRECTNESS

# the r10 de-hint sweep (SF-growing broadcast sides) + the two
# global-window -> 1-row-scalar conversions
DEHINTED = [
    "topk_part_type_tokens",
    "join_multi_hop",
    "shipping_priority",
    "local_supplier_volume",
    "map_function_suite",
    "association_rules_brands",
    "approx_distinct_parts",
    "nation_pair_volume",
    "product_profit_by_nation",
    "cheapest_supplier_per_part",
    "promo_revenue_ratio",
    "having_big_orders",
    "disjunctive_part_revenue",
    "embedding_quantization",
    "market_share_region",
    "returned_items_customers",
    "top_supplier_revenue",
    "important_parts_share",
    "supplier_count_by_part_attrs",
    "excess_inventory_suppliers",
    "scd2_pointintime_join",
    "hhi_supplier_nation",
    "simpson_paradox_audit",
    "target_encoding_oof",
    "diff_in_diff_revenue",
    "mi_feature_ranking",
    "join_left_impute_flag",
    # r11: the value-surface-hardened certificates + the grid twin —
    # their keep/flag/bound decisions are CLAIMED partition- and
    # plan-independent (integer-exact cross-multiplication, bool_and
    # flags, bucket-space clips); certify it under the forced
    # worst-case re-plan like the de-hinted cohort
    "mixture_sample_docs",
    "xml_extract_orders",
    "codec_roundtrip_suite",
    "winsorized_value_stats_grid",
]


def _canon(rows):
    # exact representation compare: repr() of a float is its shortest
    # round-trip form, so ANY bit difference shows
    return sorted(tuple(repr(v) for v in row) for row in rows)


@pytest.mark.parametrize("name", DEHINTED)
def test_result_is_plan_independent(spark, name):
    base = _canon(QUERIES[name](spark, SF_DIR_CORRECTNESS).collect())

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        forced = _canon(QUERIES[name](spark, SF_DIR_CORRECTNESS).collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    assert forced == base, (
        f"{name}: result depends on join strategy / partition count — "
        "the shuffle-join plan this query gets at 100 TB returns "
        "different values than the broadcast plan at test SF"
    )
