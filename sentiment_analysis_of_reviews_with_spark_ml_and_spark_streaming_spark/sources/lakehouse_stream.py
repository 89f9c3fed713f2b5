"""``spark.read``/``readStream`` ``.format("lakehouse")`` — a Python
DataSource over the table-format commit log
(operators/table_format.py), the streaming half of the Delta/Iceberg
substitute (ROADMAP item 2; jars absent from this container).

Streaming contract (same as Delta's streaming source):

* The offset IS the commit version — ``{"version": v}`` checkpoints a
  position in the log, and every micro-batch is the set of files ADDED
  by versions ``(start, end]``. Data files are immutable, so any
  committed range replays byte-identically on failure recovery —
  the deterministic-replay property exactly-once sinks require.
* **Append-only by default**: a commit that REMOVES files (merge,
  delete, compact, cluster) poisons a row-level stream, so the reader
  raises unless ``ignoreChanges=true`` — in which case rewritten files
  are re-emitted whole (downstream must dedupe on a key), exactly
  Delta's documented ``ignoreChanges`` semantics.
* ``startingVersion`` (default: all history) seats the first batch.

Scale shape: one input partition per added data file — Spark schedules
them across executors, each worker reads ONLY its file through Arrow
(``pyarrow.parquet`` → ``RecordBatch`` yields, zero row-at-a-time
Python), and a 1000-commit backlog fans out as wide as the cluster.
Every row is tagged ``_commit_version`` (batch reads derive it from
the ``data/v{version:08d}-`` path prefix the writer stamps).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from ..operators import table_format as tf

_VERSION_COL = "_commit_version"


class _FilePartition(InputPartition):
    def __init__(
        self, path: str, version: int, dv_sidecar: str | None = None
    ):
        self.path = path
        self.version = version
        self.dv_sidecar = dv_sidecar  # abs path; rows masked on read


def _table_schema(root: str) -> StructType:
    _live, schema = tf.snapshot_files(root)
    st = StructType.fromJson(schema)
    return StructType(
        st.fields + [StructField(_VERSION_COL, LongType(), False)]
    )


def _read_file_batches(
    path: str, version: int, schema: StructType, dv_sidecar: str | None = None
):
    """Arrow-native file read: yield RecordBatches matching ``schema``
    (older files missing newer columns are null-backfilled — the same
    schema-on-read rule as table_format.read_table). ``dv_sidecar``
    masks merge-on-read deleted row positions (numpy boolean mask over
    the file's row order — parquet reads preserve it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = pa.schema(
        [
            pa.field(f.name, _arrow_type(f.dataType))
            for f in schema.fields
            if f.name != _VERSION_COL
        ]
        + [pa.field(_VERSION_COL, pa.int64())]
    )
    tbl = pq.read_table(path)
    if dv_sidecar:
        import numpy as np

        import pyarrow.compute as pc

        dvt = pq.read_table(dv_sidecar)
        mine = dvt.filter(pc.equal(dvt.column("file"), os.path.basename(path)))
        pos = mine.column("pos").to_numpy(zero_copy_only=False)
        mask = np.ones(tbl.num_rows, dtype=bool)
        mask[pos.astype(np.int64)] = False
        tbl = tbl.filter(pa.array(mask))
    n = tbl.num_rows
    cols = []
    for field in target:
        if field.name == _VERSION_COL:
            cols.append(pa.array([version] * n, type=pa.int64()))
        elif field.name in tbl.column_names:
            cols.append(tbl.column(field.name).cast(field.type).combine_chunks())
        else:
            cols.append(pa.nulls(n, type=field.type))
    out = pa.table(cols, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


def _arrow_type(dt):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    try:
        return to_arrow_type(dt)
    except Exception:  # pragma: no cover - exotic types
        return pa.string()


class LakehouseBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.root = options["path"]
        self.schema = schema

    def partitions(self):
        live, _ = tf.snapshot_files(self.root)
        parts = []
        for a in live:
            rel = a["path"]
            # data/v{version:08d}-{uuid}/part-... — writer-stamped
            ver = int(os.path.basename(os.path.dirname(rel))[1:9])
            dv = a.get("dv")
            parts.append(
                _FilePartition(
                    os.path.join(self.root, rel),
                    ver,
                    os.path.join(self.root, dv["sidecar"]) if dv else None,
                )
            )
        return parts or [_FilePartition("", -1)]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_file_batches(
            partition.path, partition.version, self.schema,
            getattr(partition, "dv_sidecar", None),
        )


class LakehouseStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.root = options["path"]
        self.schema = schema
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.starting = int(options.get("startingversion", 0)) - 1

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        return {"version": tf.latest_version(self.root)}

    def partitions(self, start: dict, end: dict):
        parts = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rec = tf._read_commit(self.root, v)
            if (rec.get("remove") or rec.get("dv")) and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} ({rec['action']}) removes or DV-deletes "
                    "rows; the stream is append-only — set "
                    "ignoreChanges=true to re-emit rewritten files and "
                    "skip DV commits (downstream must dedupe)"
                )
            for a in rec.get("add", []):
                parts.append(
                    _FilePartition(os.path.join(self.root, a["path"]), v)
                )
        # A range with zero added files still needs one (empty) split:
        # Spark requires at least one partition per planned batch.
        return parts or [_FilePartition("", start["version"])]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_file_batches(
            partition.path, partition.version, self.schema
        )

    def commit(self, end: dict) -> None:
        pass  # log-backed source: nothing to release


class LakehouseTableDataSource(DataSource):
    """Register with ``spark.dataSource.register(LakehouseTableDataSource)``,
    then::

        spark.read.format("lakehouse").option("path", root).load()
        spark.readStream.format("lakehouse").option("path", root).load()
    """

    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def schema(self) -> StructType:
        return _table_schema(self.options["path"])

    def reader(self, schema) -> LakehouseBatchReader:
        return LakehouseBatchReader(schema, self.options)

    def streamReader(self, schema) -> LakehouseStreamReader:
        return LakehouseStreamReader(schema, self.options)


def register_lakehouse_source(spark) -> None:
    spark.dataSource.register(LakehouseTableDataSource)
