"""Eager localCheckpoint with metrics folded into the checkpoint job.

Guide §1.2 / VERDICT r14 #5: the iterative operators (BFS, fused
Bellman-Ford, IVM refresh) paid TWO Spark jobs per round — the eager
pin, then a separate isEmpty()/agg probe over the frame they had just
materialized. A named CollectMetrics node rides the checkpoint's own
materialization, so the probe is free.

Deliberately NOT ``pyspark.sql.Observation``: its implementation
registers with the session-level ObservationManager, and after any
query used it, every subsequent STREAMING query in the same session
died at task-closure serialization (``NotSerializableException:
org.apache.spark.sql.classic.ObservationManager`` — found when bench
r15 run 1 killed score_stream, reproduced with graph_weighted_paths +
a rate stream). The string-named ``observe`` variant plants the same
CollectMetrics node but keeps no session state; the values come back
through the observed plan's OWN QueryExecution after the eager
checkpoint has run it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame


def checkpoint_with_metrics(
    df: DataFrame, name: str, *aggs: Column
) -> tuple[DataFrame, dict[str, Any]]:
    """``df.localCheckpoint(eager=True)`` + the given aggregate
    metrics computed in the SAME job. Returns (checkpointed_df,
    {metric_alias: value}). The metric names are plan-local, so reuse
    across rounds/queries is safe (each round's input is the previous
    round's checkpointed LogicalRDD — no CollectMetrics survives into
    it)."""
    observed = df.observe(name, *aggs)
    ck = observed.localCheckpoint(eager=True)
    om = observed._jdf.queryExecution().observedMetrics()
    row = om.apply(name)
    schema = row.schema()
    out: dict[str, Any] = {}
    for i in range(schema.size()):
        out[schema.apply(i).name()] = row.get(i)
    return ck, out
