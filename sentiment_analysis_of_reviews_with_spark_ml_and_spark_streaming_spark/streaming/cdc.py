"""Streaming dimension maintenance: SCD2 merges applied per
micro-batch via foreachBatch.

The reference's streaming layer only scores incoming text
(Streaming_Final.py); this is uplift the same Structured Streaming
surface makes natural: a CDC feed of dimension updates folds into a
versioned (type-2) dimension table continuously, one
``layout.scd2_merge`` per micro-batch.

Replay safety: foreachBatch gives at-least-once delivery — a batch can
re-run after a crash. ``scd2_merge`` is IDEMPOTENT for a replayed
batch: the second application finds every update equal to the (already
current) row, takes the no-change path, and rewrites the dim byte-
identically. That property (asserted in
tests/test_scd2_and_formats.py) is what lets this sink run without a
transaction log.

The commit is a write-to-temp + directory swap — atomic on a local
filesystem / single driver. On HDFS/S3 at 100 TB swap via the
FileSystem rename API or, better, let a table format (Delta/Iceberg
MERGE) own the commit protocol (ROADMAP item 2); the merge PLAN this
module builds is the same either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

from ..operators.layout import scd2_merge


def scd2_sink(
    dim_path: str,
    *,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str = "effective_date",
):
    """Build a ``foreachBatch`` callable that folds each micro-batch of
    updates into the versioned dimension at ``dim_path``.

    Each batch row carries ``key_cols`` + ``tracked_cols`` +
    ``effective_col`` (the as-of date for the batch; the max over the
    batch is used, so a batch spanning dates closes rows at its latest
    date). Empty batches are skipped without touching the dim.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        eff = batch_df.agg(F.max(effective_col)).first()[0]
        if eff is None:  # empty batch
            return
        spark = batch_df.sparkSession
        current = spark.read.parquet(dim_path)
        merged = scd2_merge(
            current,
            batch_df.drop(effective_col),
            key_cols=key_cols,
            tracked_cols=tracked_cols,
            effective_date=str(eff)[:10],
        )
        tmp = dim_path.rstrip("/") + f"._scd2_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(dim_path)
        os.rename(tmp, dim_path)

    return apply
