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

The commit is write-to-temp, rename-current-aside, rename-temp-in,
delete-old — never a delete-before-rename, so no crash point leaves
BOTH the dim and its predecessor missing; a crash between the renames
is repaired by the next apply() (restore the set-aside copy, then let
checkpointed foreachBatch replay the batch — idempotent). On HDFS/S3
at 100 TB use the FileSystem rename API or, better, let a table format
(Delta/Iceberg MERGE) own the commit protocol (ROADMAP item 2); the
merge PLAN this module builds is the same either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window, functions as F

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
    date). A CDC feed can coalesce several commits for one key into a
    single trigger, so the batch is reduced LAST-WINS per key (latest
    ``effective_col``; ties break on the tracked values for
    determinism) before the merge — ``scd2_merge`` requires one row
    per key. Empty batches are skipped without touching the dim.

    Commit protocol: write merged → rename current dim aside → rename
    merged in → delete the old copy. There is no window where both the
    dim and its predecessor are missing; if a crash lands between the
    two renames, the next apply() restores the set-aside copy before
    merging (checkpointed foreachBatch then replays the batch, and the
    merge's idempotence makes the replay safe).
    """
    prev = dim_path.rstrip("/") + "._scd2_prev"

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # crash repair FIRST — it needs no batch data, and an empty
        # replayed batch must still restore the set-aside dim so
        # concurrent readers of dim_path never wait for a non-empty one
        if not os.path.exists(dim_path) and os.path.exists(prev):
            os.rename(prev, dim_path)  # crash between the two renames
        eff = batch_df.agg(F.max(effective_col)).first()[0]
        if eff is None:  # empty batch
            return
        spark = batch_df.sparkSession
        # last-wins per key: latest effective date, then tracked values
        # as a deterministic tiebreak for same-timestamp events
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(effective_col).desc(),
            *[F.col(c).desc_nulls_last() for c in tracked_cols],
        )
        reduced = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        current = spark.read.parquet(dim_path)
        merged = scd2_merge(
            current,
            reduced.drop(effective_col),
            key_cols=key_cols,
            tracked_cols=tracked_cols,
            effective_date=str(eff)[:10],
        )
        tmp = dim_path.rstrip("/") + f"._scd2_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(prev):  # leftover from an interrupted commit
            shutil.rmtree(prev)
        os.rename(dim_path, prev)
        os.rename(tmp, dim_path)
        shutil.rmtree(prev)

    return apply
