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
