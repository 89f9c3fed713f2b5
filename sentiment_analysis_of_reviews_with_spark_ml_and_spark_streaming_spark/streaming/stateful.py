"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for stateful semantics the built-in windowed aggs
can't express (SURVEY.md §7 / build-brief 'custom stateful operators').
State lives in Spark's state store (checkpointed, partitioned by key,
scale-out); the Python side sees Arrow batches per key + a typed state
handle — no driver involvement per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running (count, sum, max) per key across micro-batches.

    Output one row per key per batch with the accumulated totals —
    the kind of lifetime-aggregate a watermarked window can't express
    (state never expires here; production would use a TTL timeout).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cnt, total, mx = state.get
        else:
            cnt, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
            if len(pdf):
                mx = max(mx, float(pdf[value_col].max()))
        state.update((cnt, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [cnt],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double, max_value double",
        stateStructType="cnt long, total double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    events: DataFrame,
    *,
    value_col: str = "event_type",
    k: int = 64,
    num_shards: int = 8,
) -> DataFrame:
    """Continuous Misra-Gries heavy hitters over an unbounded stream.

    Values are hash-sharded (``xxhash64 % num_shards``) so state
    parallelizes; a value always routes to the same shard, so each
    shard's Misra-Gries dict (operators/sketch semantics, ≤ ``k``
    counters in the state store regardless of stream cardinality) is
    a faithful MG summary of that value's ENTIRE substream. Any value
    with substream frequency > N_shard/(k+1) is guaranteed present in
    its shard's emitted candidates — the batch-side guarantee, carried
    over micro-batches by the state store (checkpointed; survives
    restart).

    Emits (shard, value, mg_weight lower bound) per shard per batch in
    update mode; a downstream consumer takes top-m across shards or
    recounts exactly. Contrast with the built-in windowed count: this
    never stores one state row per distinct value.
    """
    from ..operators.sketch import _mg_reduce

    keyed = events.select(
        (F.abs(F.xxhash64(F.col(value_col))) % num_shards).alias("shard"),
        F.col(value_col).cast("string").alias("value"),
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            values, weights = state.get
            counters = dict(zip(values, weights))
        else:
            counters = {}
        for pdf in pdfs:
            for value, cnt in pdf["value"].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            counters = _mg_reduce(counters, k)
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "value": list(counters.keys()),
                "mg_weight": [int(v) for v in counters.values()],
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard long, value string, mg_weight long",
        stateStructType="values array<string>, weights array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
