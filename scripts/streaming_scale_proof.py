"""Round-10 streaming scale-proof (VERDICT r9 next-step #4): the two
stateful streaming flagships driven at 1x and 10x — 10x the input
rate AND 10x the key cardinality — with the state-store size read
from query progress, so the documented state bounds become MEASURED
claims like the batch slowest-11 table in docs/SCALING.md:

- stream_near_dup_pairs: state rows must scale with DISTINCT band
  keys (O(4 x families)), never with rows ingested — the per-group
  FIFO cap bounds each group's arrays. Throughput must degrade
  sub-linearly in key cardinality.
- streaming_heavy_hitters: state rows must stay EXACTLY num_shards at
  any cardinality (one Misra-Gries row per shard, <= k counters in
  it) — the whole point of the sketch vs a per-value count.

Same doc-family recipe as bench.streaming_bench: family = value %
N_FAMILIES picks the 12-word text, so 10x families = 10x distinct
fingerprints/band keys at the same duplicate-heavy profile.

r11 extension (VERDICT r10 next-step #7): the four remaining stateful
twins — streaming_ewma, streaming_cusum, streaming_weighted_reservoir,
streaming_interval_merge — get the same 1x/10x state-curve treatment
(state rows must track distinct keys, never rows ingested; per-row
cost must not grow with cardinality). Their stream==batch equality was
already pinned in tests/test_stateful_and_properties.py.

    python scripts/streaming_scale_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
    stream_near_dup_pairs,
    streaming_cusum,
    streaming_ewma,
    streaming_heavy_hitters,
    streaming_interval_merge,
    streaming_weighted_reservoir,
)

SETTLE_S = 30
VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc_stream(spark, rows_per_batch: int, families: int):
    """bench.streaming_bench's synthetic doc stream, family count
    parameterized: every doc in a family renders the same 12 words,
    so distinct fingerprints == families. rate-micro-batch (not rate):
    deterministic rows per TRIGGER, so a saturated pipeline yields N
    equal measured triggers instead of one ever-growing backlog batch
    that is still running at stop time."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(w) for w in VOCAB]),
                        (
                            ((F.col("value") % families) % (i + 3)) % 10 + 1
                        ).cast("int"),
                    )
                    for i in range(12)
                ],
            ).alias("text"),
        )
    )


def _drain(query, settle_s: float) -> dict:
    """Progress metrics + state-store rows/memory from the LAST
    non-empty trigger (state size is cumulative, so last = largest)."""
    time.sleep(settle_s)
    progress = [p for p in query.recentProgress if p is not None]
    query.stop()
    query.awaitTermination(30)
    rows = [p for p in progress[1:] if p["numInputRows"] > 0]
    if not rows:
        return {"rows_per_sec": 0.0, "n_triggers": 0}
    rps = [p["processedRowsPerSecond"] for p in rows]
    total_in = sum(p["numInputRows"] for p in progress)
    last_state = None
    for p in reversed(rows):
        if p.get("stateOperators"):
            last_state = p["stateOperators"][0]
            break
    out = {
        "rows_per_sec": round(sum(rps) / len(rps), 1),
        "trigger_ms_avg": round(
            sum(p["durationMs"]["triggerExecution"] for p in rows)
            / len(rows),
            1,
        ),
        "n_triggers": len(rows),
        "input_rows_total": int(total_in),
    }
    if last_state:
        out["state_rows"] = int(last_state["numRowsTotal"])
        out["state_bytes"] = int(last_state["memoryUsedBytes"])
    return out


def run_near_dup(spark, rows_per_batch: int, families: int,
                 cap: int) -> dict:
    docs = _doc_stream(spark, rows_per_batch, families)
    q = (
        stream_near_dup_pairs(docs, max_state_per_band=cap)
        .writeStream.outputMode("append")
        .format("noop")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="scale-neardup-"),
        )
        .trigger(processingTime="1 second")
        .start()
    )
    return _drain(q, SETTLE_S)


def run_heavy_hitters(spark, rows_per_batch: int, cardinality: int) -> dict:
    events = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(
            F.concat(
                F.lit("type_"), (F.col("value") % cardinality).cast("string")
            ).alias("event_type")
        )
    )
    q = (
        streaming_heavy_hitters(events, k=64, num_shards=8)
        .writeStream.outputMode("update")
        .format("noop")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="scale-mg-")
        )
        .trigger(processingTime="1 second")
        .start()
    )
    return _drain(q, SETTLE_S)


def _keyed_value_stream(spark, rows_per_batch: int, keys: int):
    """(user_id, event_id, value) rows: key = value % keys, event_id
    strictly increasing (so per-key order is well-defined), value a
    bounded float — the input shape of the EWMA/CUSUM twins."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(
            (F.col("value") % keys).alias("user_id"),
            F.col("value").alias("event_id"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )


def _run_stateful(stream_df, build, prefix: str, mode: str = "append") -> dict:
    q = (
        build(stream_df)
        .writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=prefix))
        .trigger(processingTime="1 second")
        .start()
    )
    return _drain(q, SETTLE_S)


def run_twin_scales(spark) -> tuple[dict, list[tuple[str, bool, str]]]:
    """r11 extension (VERDICT r10 next-step #7): the four remaining
    stateful twins — EWMA, CUSUM, weighted reservoir, interval merge —
    measured at 1x (5k rows/trigger, 200 keys) and 10x (50k
    rows/trigger, 2000 keys). Their stream==batch equality is already
    pinned in tests/test_stateful_and_properties.py; what was missing
    is the STATE CURVE: state rows must track DISTINCT KEYS (one state
    row per group for all four — O(1) scalars for EWMA/CUSUM/interval,
    an O(k)-bounded array pair for the reservoir), never rows
    ingested, and per-row cost must not grow with cardinality."""
    result: dict[str, dict] = {}
    checks: list[tuple[str, bool, str]] = []
    r1, k1 = 5_000, 200
    r10, k10 = 50_000, 2_000

    def kv(rows, keys):
        return _keyed_value_stream(spark, rows, keys)

    twins = {
        "streaming_ewma": lambda df: streaming_ewma(df, alpha=0.5),
        "streaming_cusum": lambda df: streaming_cusum(
            df, target=50.0, threshold=500.0
        ),
    }
    for name, build in twins.items():
        m1 = _run_stateful(kv(r1, k1), build, f"scale-{name}-")
        m10 = _run_stateful(kv(r10, k10), build, f"scale-{name}-")
        result[name] = {"x1": m1, "x10": m10}
        for tag, m, keys in (("x1", m1, k1), ("x10", m10, k10)):
            if "state_rows" in m:
                checks.append((
                    f"{name}_state_keys_{tag}",
                    m["state_rows"] <= keys,
                    f"{m['state_rows']} state rows <= {keys} keys "
                    f"({m['input_rows_total']} rows ingested)",
                ))
        if m1.get("rows_per_sec") and m10.get("rows_per_sec"):
            ratio = m10["rows_per_sec"] / m1["rows_per_sec"]
            checks.append((
                f"{name}_throughput_sublinear",
                ratio >= 1.0,
                f"capacity x10/x1 = {ratio:.2f}",
            ))

    # weighted reservoir: group_col is a STRING type key
    def res_stream(rows, keys):
        return (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows)
            .load()
            .select(
                F.concat(
                    F.lit("g"), (F.col("value") % keys).cast("string")
                ).alias("event_type"),
                F.col("value").alias("event_id"),
                (F.col("value") % 100 + 1).cast("double").alias("value"),
            )
        )

    def res_build(df):
        return streaming_weighted_reservoir(df, k=5)

    m1 = _run_stateful(res_stream(r1, k1), res_build, "scale-res-", "update")
    m10 = _run_stateful(
        res_stream(r10, k10), res_build, "scale-res-", "update"
    )
    result["streaming_weighted_reservoir"] = {"x1": m1, "x10": m10}
    for tag, m, keys in (("x1", m1, k1), ("x10", m10, k10)):
        if "state_rows" in m:
            checks.append((
                f"reservoir_state_groups_{tag}",
                m["state_rows"] <= keys,
                f"{m['state_rows']} state rows <= {keys} groups "
                f"(k=5 ids+keys arrays inside each; "
                f"{m['input_rows_total']} rows ingested)",
            ))
    if "state_bytes" in m1 and "state_bytes" in m10:
        checks.append((
            "reservoir_state_bytes_o_k_groups",
            m10["state_bytes"] <= m1["state_bytes"] * 15,
            f"{m10['state_bytes']} vs {m1['state_bytes']} bytes "
            "(<= 15x for 10x groups: O(k x groups), never O(rows))",
        ))

    # interval merge: starts arrive non-decreasing per key by
    # construction (event order). Per key, consecutive starts are
    # `keys` apart and e = s + (s % 3) * keys, so ~1/3 of intervals
    # END before the next one starts (a closed block is emitted) and
    # the rest merge — both paths of the operator run at both scales.
    def iv_stream(rows, keys):
        return (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows)
            .load()
            .select(
                (F.col("value") % keys).alias("user_id"),
                F.col("value").alias("s"),
                (F.col("value") + (F.col("value") % 3) * keys).alias("e"),
            )
        )

    m1 = _run_stateful(iv_stream(r1, k1), streaming_interval_merge, "scale-iv-")
    m10 = _run_stateful(
        iv_stream(r10, k10), streaming_interval_merge, "scale-iv-"
    )
    result["streaming_interval_merge"] = {"x1": m1, "x10": m10}
    for tag, m, keys in (("x1", m1, k1), ("x10", m10, k10)):
        if "state_rows" in m:
            checks.append((
                f"interval_state_open_blocks_{tag}",
                m["state_rows"] <= keys,
                f"{m['state_rows']} state rows <= {keys} keys (one "
                f"open block each; {m['input_rows_total']} ingested)",
            ))
    return result, checks


def main() -> None:
    spark = get_spark(app_name="streaming-scale-proof")
    result: dict[str, dict] = {}

    # --- near-dup: 1x = bench profile (2k docs/trigger, 500
    # families); 10x = 20k docs/trigger, 5000 families. cap small
    # enough that hot families HIT it during the run (x1 sees ~120
    # docs/family). 60 s settle: the x10 triggers run ~8 s each.
    global SETTLE_S
    SETTLE_S = 60
    nd1 = run_near_dup(spark, 2_000, 500, cap=100)
    nd10 = run_near_dup(spark, 20_000, 5_000, cap=100)
    SETTLE_S = 30
    result["stream_near_dup_pairs"] = {"x1": nd1, "x10": nd10}

    # --- heavy hitters: 1x = 10k rows/trigger over 500 values; 10x =
    # 100k rows/trigger over 5000 values. State rows must be EXACTLY
    # num_shards at both.
    hh1 = run_heavy_hitters(spark, 10_000, 500)
    hh10 = run_heavy_hitters(spark, 100_000, 5_000)
    result["streaming_heavy_hitters"] = {"x1": hh1, "x10": hh10}

    twin_result, twin_checks = run_twin_scales(spark)
    result.update(twin_result)

    checks: list[tuple[str, bool, str]] = list(twin_checks)

    def check(name: str, ok: bool, detail: str) -> None:
        checks.append((name, bool(ok), detail))

    # near-dup state scales with band keys (<= 4 bands x families with
    # hash-collision slack), NOT with rows ingested
    if "state_rows" in nd1 and "state_rows" in nd10:
        check(
            "neardup_state_keys_x1",
            nd1["state_rows"] <= 4 * 500 * 1.05,
            f"{nd1['state_rows']} state rows vs <= {int(4 * 500 * 1.05)}",
        )
        check(
            "neardup_state_keys_x10",
            nd10["state_rows"] <= 4 * 5_000 * 1.05,
            f"{nd10['state_rows']} state rows vs <= {int(4 * 5000 * 1.05)}",
        )
        check(
            "neardup_state_not_rows_x10",
            nd10["state_rows"] < nd10["input_rows_total"] / 5,
            f"{nd10['state_rows']} state rows "
            f"<< {nd10['input_rows_total']} ingested",
        )
    # sub-linear throughput degradation: capacity at 10x cardinality
    # stays within 3x of the 1x capacity per row (i.e. >= 1/3)
    if nd1.get("rows_per_sec") and nd10.get("rows_per_sec"):
        ratio = nd10["rows_per_sec"] / nd1["rows_per_sec"]
        check(
            "neardup_throughput_sublinear",
            ratio >= 1.0,
            f"capacity x10/x1 = {ratio:.2f} (>= 1.0 => per-row cost "
            "did not grow with cardinality)",
        )
    # heavy hitters: state rows pinned at num_shards, both scales
    for tag, hh in (("x1", hh1), ("x10", hh10)):
        if "state_rows" in hh:
            check(
                f"mg_state_rows_{tag}",
                hh["state_rows"] == 8,
                f"{hh['state_rows']} state rows == num_shards 8",
            )
    if "state_bytes" in hh1 and "state_bytes" in hh10:
        check(
            "mg_state_bytes_flat",
            hh10["state_bytes"] <= hh1["state_bytes"] * 3,
            f"{hh10['state_bytes']} vs {hh1['state_bytes']} bytes "
            "(<= 3x: O(k x shards) regardless of cardinality)",
        )

    result["checks"] = {
        n: {"ok": ok, "detail": d} for n, ok, d in checks
    }
    n_fail = sum(1 for _, ok, _ in checks if not ok)
    spark.stop()
    print(json.dumps(result, indent=1))
    print(f"CHECKS: {len(checks) - n_fail}/{len(checks)} ok")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
