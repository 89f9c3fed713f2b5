"""A minimal lakehouse table format on plain parquet — the metadata
layer ROADMAP item 2 deferred while the Delta/Iceberg jars are absent
from this container.

Same architecture the real formats use, re-expressed in ~300 lines:

* **Commit log**: ``<root>/_log/{version:08d}.json`` — one JSON action
  record per commit, created with ``O_CREAT|O_EXCL`` so two writers
  racing for the same version get exactly one winner (optimistic
  concurrency; the loser raises :class:`CommitConflict` and retries on
  fresh state). Data files are immutable; a commit only ever ADDs new
  files and logically REMOVEs old ones, so readers of any version are
  never torn.
* **Snapshots / time travel**: the live file set of version ``v`` is
  the replay of adds minus removes up to ``v``. Any historical version
  stays readable until :func:`vacuum` reclaims its unreferenced files.
* **File-level stats pruning**: each add records per-file min/max for
  the declared stat columns (one tiny agg over the just-written files,
  grouped by ``input_file_name``). :func:`merge_upsert` and
  :func:`delete_where` prune to candidate files via those stats, so a
  10-row upsert into a 100 TB table rewrites only the files whose
  [min,max] key range can contain the keys — everything else is
  carried by reference, never read, never written (copy-on-write at
  file granularity, exactly Delta's MERGE).
* **Log checkpoints**: every ``checkpoint_every`` commits the full live
  file list is consolidated into ``{version:08d}.checkpoint.json``;
  replay starts at the newest checkpoint ≤ the requested version, so
  log-replay cost is O(files/commit × checkpoint interval), not
  O(total history) — the same reason Delta writes parquet checkpoints.
* **Deletion vectors (merge-on-read)**: ``delete_where(mode="mor")``
  marks rows deleted WITHOUT rewriting their gigabyte data files — a
  commit attaches a tiny parquet sidecar of ``(file, row position)``
  pairs, and every reader anti-joins it back out (Delta DVs / Iceberg
  v2 position deletes). At 100 TB this turns "delete 5 rows" from a
  1 GB rewrite into a 1 KB sidecar write; the read-side anti-join cost
  is reclaimed by the next :func:`compact`/:func:`optimize_cluster`,
  which applies and clears the vectors. Sidecars are cumulative per
  file (one sidecar read per file, never a chain) and row positions
  are parquet row indices (``_metadata.row_index``), so a file's DV
  survives unrelated commits untouched.

Driver-side metadata is proportional to file COUNT, not data bytes —
the standard lakehouse trade; at 100 TB with ~1e5 files the replay is
a few MB of JSON. No daemon, no service: any Spark job (or a plain
python process) with filesystem access can read or commit.

Single-filesystem scope: atomicity relies on ``O_EXCL`` create, which
holds on POSIX and HDFS-style stores; S3 needs a commit coordinator —
out of scope here, as it is for OSS Delta.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

_LOG = "_log"


class CommitConflict(RuntimeError):
    """Another writer committed this version first; reload and retry."""


# --------------------------------------------------------------------------
# log primitives


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _commit_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def _checkpoint_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.checkpoint.json")


def latest_version(root: str) -> int:
    """Highest committed version, or -1 for a nonexistent table."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return -1
    vs = [
        int(f[:8])
        for f in os.listdir(d)
        if f.endswith(".json") and not f.endswith(".checkpoint.json")
    ]
    return max(vs, default=-1)


def _write_commit(root: str, version: int, record: dict) -> None:
    """Atomically publish the commit file. Content is fully written to
    a private temp file first, then ``os.link``ed onto the final name —
    link is the one atomic step (it fails with ``FileExistsError`` for
    the race loser, same exclusivity as O_EXCL), and unlike
    create-then-write it never exposes a torn/empty commit to a
    concurrent reader's ``json.load``. Stamps the commit wall-clock
    (``ts``) for history and timestamp travel."""
    import time

    os.makedirs(_log_dir(root), exist_ok=True)
    path = _commit_path(root, version)
    record.setdefault("ts", time.time())
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed at {path}"
        ) from None
    finally:
        os.unlink(tmp)


def _read_commit(root: str, version: int) -> dict:
    with open(_commit_path(root, version)) as f:
        return json.load(f)


def history(root: str) -> list[dict]:
    """All commit records, oldest first (version/action/row counts)."""
    out = []
    for v in range(latest_version(root) + 1):
        rec = _read_commit(root, v)
        out.append(
            {
                "version": rec["version"],
                "action": rec["action"],
                "n_added": len(rec.get("add", [])),
                "n_removed": len(rec.get("remove", [])),
                "rows_added": sum(a.get("rows", 0) for a in rec.get("add", [])),
                "n_dv_files": len(rec.get("dv", {})),
                "ts": rec.get("ts"),
            }
        )
    return out


def effective_timestamps(root: str) -> list[float]:
    """Per-version skew-adjusted commit wall-clocks: the running max
    makes the timeline monotone even under writer clock skew — the
    same adjustment Delta applies. Commits written before timestamps
    existed sort as 0. This is THE one timestamp policy; both batch
    ``TIMESTAMP AS OF`` (:func:`version_at_timestamp`) and the
    streaming source's ``startingTimestamp`` resolve through it so the
    two can never disagree on the same table."""
    out, eff = [], 0.0
    for v in range(latest_version(root) + 1):
        eff = max(eff, _read_commit(root, v).get("ts", 0.0))
        out.append(eff)
    return out


def version_at_timestamp(root: str, ts: float) -> int:
    """The newest version whose commit wall-clock is ≤ ``ts`` (Delta's
    ``TIMESTAMP AS OF``). Raises if the table didn't exist yet."""
    best = -1
    for v, eff in enumerate(effective_timestamps(root)):
        if eff <= ts:
            best = v
        else:
            break
    if best < 0:
        raise ValueError(
            f"no commit at or before timestamp {ts} in {root}"
        )
    return best


def snapshot_files(root: str, version: int | None = None) -> tuple[list[dict], dict]:
    """Live ``add`` entries and the latest schema record at ``version``
    (default: latest). Replays from the newest checkpoint ≤ version."""
    head = latest_version(root)
    if head < 0:
        raise FileNotFoundError(f"no table at {root}")
    v = head if version is None else version
    if not 0 <= v <= head:
        raise ValueError(f"version {v} out of range [0, {head}]")
    start, live, schema = 0, {}, None
    for cv in range(v, -1, -1):
        cp = _checkpoint_path(root, cv)
        if os.path.exists(cp):
            with open(cp) as f:
                ck = json.load(f)
            live = {a["path"]: a for a in ck["live"]}
            schema = ck["schema"]
            start = cv + 1
            break
    for cv in range(start, v + 1):
        rec = _read_commit(root, cv)
        for p in rec.get("remove", []):
            live.pop(p, None)
        for a in rec.get("add", []):
            live[a["path"]] = a
        for p, d in rec.get("dv", {}).items():
            if p in live:  # merge-on-read: cumulative DV replaces prior
                live[p] = {
                    **live[p],
                    "dv": {"sidecar": d["sidecar"], "rows": d["rows"]},
                }
        if rec.get("schema"):
            schema = rec["schema"]
    return sorted(live.values(), key=lambda a: a["path"]), json.loads(schema)


def _maybe_checkpoint(root: str, version: int, checkpoint_every: int) -> None:
    if checkpoint_every <= 0 or version == 0 or version % checkpoint_every:
        return
    live, schema = snapshot_files(root, version)
    # consolidated exactly-once ledger: batch ids of every commit ≤
    # version, so committed_batch_ids replays only the log SUFFIX —
    # without this, every streaming micro-batch re-reads the whole
    # history and per-batch latency grows linearly forever. Computed
    # BEFORE the checkpoint file is created, or the scan would find
    # its own empty file. Published via temp+rename so a concurrent
    # reader never json.loads a torn checkpoint.
    batch_ids = sorted(_batch_ids_through(root, version))
    path = _checkpoint_path(root, version)
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": version,
                "live": live,
                "schema": json.dumps(schema),
                "batch_ids": batch_ids,
            },
            f,
        )
    os.replace(tmp, path)


def _batch_ids_through(root: str, version: int) -> set[int]:
    """All streaming batch ids committed at or before ``version``,
    reading from the newest consolidated checkpoint ≤ version and then
    only the commit suffix (pre-consolidation checkpoints lack the key
    and fall through to older checkpoints / version 0)."""
    out: set[int] = set()
    start = 0
    for cv in range(version, -1, -1):
        cp = _checkpoint_path(root, cv)
        if not os.path.exists(cp):
            continue
        with open(cp) as f:
            ck = json.load(f)
        if "batch_ids" in ck:
            out.update(ck["batch_ids"])
            start = cv + 1
            break
    for v in range(start, version + 1):
        rec = _read_commit(root, v)
        if "batch_id" in rec:
            out.add(rec["batch_id"])
    return out


# --------------------------------------------------------------------------
# data-file helpers


def _footer_adds(
    out_dir: str, rel: str, stat_cols: list[str]
) -> list[dict] | None:
    """Per-file (rows, min/max) add-entries read straight from the
    parquet FOOTERS just written — zero Spark jobs (~2 ms vs ~250 ms +
    a job for the read-back agg; commit latency is the lakehouse DML
    queries' dominant cost). Sound only where footer stats are exact
    and match Spark's agg semantics bit-for-bit, so the gate admits
    integer / boolean / date stat columns ONLY and returns ``None``
    (caller falls back to the Spark agg) for anything else:

    - floats: parquet stats EXCLUDE NaN while Spark's min/max order it
      largest — footer bounds would unsoundly prune NaN-holding files;
    - strings: parquet may truncate long min/max and this pyarrow has
      no ``is_*_value_exact`` flags to detect it;
    - timestamps: footer values are UTC-normalized, Spark's agg renders
      in the session zone — the rendered bounds could disagree.

    Empty part files (committed by empty partitions) are removed here,
    mirroring the agg path's cleanup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds: list[dict] = []
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".parquet"):
            continue
        full = os.path.join(out_dir, fname)
        try:
            md = pq.ParquetFile(full).metadata
        except Exception:  # noqa: BLE001 - unreadable footer: use the agg
            return None
        if md.num_rows == 0:
            os.remove(full)
            continue
        schema = md.schema.to_arrow_schema()
        # row-group column indices address parquet LEAVES (nested
        # structs flatten to dotted paths), NOT arrow's top-level
        # fields — resolve the stat col by its leaf path, which for a
        # top-level primitive equals the bare name. A mismatch here
        # (e.g. indexing leaf "meta.b" with arrow field index 1) would
        # commit another column's bounds as the stat col's and prune
        # unsoundly.
        leaf_idx = {
            md.schema.column(i).path: i for i in range(md.num_columns)
        }
        stats: dict[str, list] = {}
        for c in stat_cols:
            idx = leaf_idx.get(c)
            fi = schema.get_field_index(c)
            if idx is None or fi < 0:
                return None
            t = schema.field(fi).type
            if not (
                pa.types.is_integer(t)
                or pa.types.is_boolean(t)
                or pa.types.is_date(t)
            ):
                return None
            mins: list = []
            maxs: list = []
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                st = grp.column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
                elif (
                    st is None
                    or not st.has_null_count
                    or st.null_count != grp.num_rows
                ):
                    return None  # stats absent but values present
            # no min/max in any row group ⇒ the column is all-NULL in
            # this file — exactly what the Spark agg would record
            stats[c] = (
                [_json_stat(min(mins)), _json_stat(max(maxs))]
                if mins
                else [None, None]
            )
        adds.append(
            {"path": os.path.join(rel, fname), "rows": md.num_rows,
             "stats": stats}
        )
    return adds


def _write_data_files(
    df: DataFrame, root: str, version: int, stat_cols: list[str]
) -> list[dict]:
    """Write ``df`` as immutable parquet under ``data/v{version}-<uuid>/``
    and return add-entries with per-file row counts and min/max stats.

    Stats come from the just-written parquet FOOTERS when every stat
    column passes :func:`_footer_adds`' exactness gate (no Spark job);
    otherwise the stats agg runs over the files just written (grouped
    by ``input_file_name``) — one scan of the NEW bytes only, the same
    footer-level bookkeeping parquet writers do; never over the table.
    """
    rel = f"data/v{version:08d}-{uuid.uuid4().hex[:8]}"
    out_dir = os.path.join(root, rel)
    df.write.mode("error").parquet(out_dir)
    fast = _footer_adds(out_dir, rel, stat_cols)
    if fast is not None:
        return sorted(fast, key=lambda a: a["path"])
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    per_file = (
        written.groupBy(F.input_file_name().alias("_file")).agg(*aggs).collect()
    )
    adds = []
    for r in per_file:
        fname = r["_file"].removeprefix("file:")
        adds.append(
            {
                "path": os.path.join(rel, os.path.basename(fname)),
                "rows": r["_rows"],
                "stats": {
                    c: [_json_stat(r[f"_min_{c}"]), _json_stat(r[f"_max_{c}"])]
                    for c in stat_cols
                },
            }
        )
    # empty partitions still produce part files; they carry no rows so
    # the stats agg never sees them — drop them now instead of leaving
    # instant orphans for vacuum.
    referenced = {os.path.basename(a["path"]) for a in adds}
    for fname in os.listdir(out_dir):
        if fname.endswith(".parquet") and fname not in referenced:
            os.remove(os.path.join(out_dir, fname))
    return sorted(adds, key=lambda a: a["path"])


def _json_stat(v):
    """Stats must live in JSON. Dates/timestamps go through isoformat —
    lexicographic order equals temporal order, so pruning comparisons
    stay correct as long as bounds are rendered the same way."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _abs_paths(root: str, adds: list[dict]) -> list[str]:
    return [os.path.join(root, a["path"]) for a in adds]


# --------------------------------------------------------------------------
# deletion vectors (merge-on-read)

_DV_SCHEMA = "file string, pos long"


def _file_base_col():
    return F.element_at(
        F.split(F.col("_metadata.file_path"), "/"), -1
    ).alias("_file")


def _row_pos_col():
    return F.col("_metadata.row_index").alias("_pos")


def _write_dv_sidecar(dv_df: DataFrame, root: str, version: int) -> str:
    """Persist cumulative ``(file, pos)`` deletion pairs as ONE parquet
    sidecar under ``data/`` (so vacuum's walk governs it like any data
    file) and return its relative path. DV rows are churn-bounded —
    mass deletes belong in copy-on-write mode — so one file suffices."""
    rel_dir = f"data/v{version:08d}-dv-{uuid.uuid4().hex[:8]}"
    out = os.path.join(root, rel_dir)
    dv_df.coalesce(1).write.mode("error").parquet(out)
    part = [f for f in os.listdir(out) if f.endswith(".parquet")]
    return os.path.join(rel_dir, part[0])


def _dv_rows(spark: SparkSession, root: str, entries: list[dict]) -> DataFrame:
    """The valid ``(file basename, pos)`` deletion pairs for these live
    entries. A sidecar is shared by every file its commit touched, and
    a LATER delete rewrites a file's cumulative rows into a NEW sidecar
    — so a pair only counts when it came from the sidecar the entry
    currently points at (join on both file and sidecar identity)."""
    pairs = sorted(
        {
            (os.path.basename(e["path"]), e["dv"]["sidecar"])
            for e in entries
            if "dv" in e
        }
    )
    if not pairs:
        return spark.createDataFrame([], _DV_SCHEMA)
    sidecars = sorted({s for _, s in pairs})
    raw = (
        spark.read.schema(_DV_SCHEMA)
        .parquet(*(os.path.join(root, s) for s in sidecars))
        .select(
            "file",
            "pos",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_sc"),
        )
    )
    lookup = spark.createDataFrame(
        [(f, os.path.basename(s)) for f, s in pairs], "file string, _sc string"
    )
    return raw.join(F.broadcast(lookup), ["file", "_sc"], "inner").select(
        "file", "pos"
    )


def _meta_schema(st: StructType) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        st.fields
        + [
            StructField("_file", StringType(), True),
            StructField("_pos", LongType(), True),
        ]
    )


def read_files(
    spark: SparkSession,
    root: str,
    entries: list[dict],
    st: StructType,
    *,
    with_meta: bool = False,
) -> DataFrame:
    """Read a set of live add-entries as one DataFrame with each file's
    deletion vector applied (merge-on-read) — the ONE read path every
    table consumer goes through. Files without a DV keep the plain
    vectorized parquet scan with zero overhead; DV'd files are read
    with parquet row positions (``_metadata.row_index``) and the
    churn-bounded sidecar pairs are anti-joined back out (broadcast
    below 2M deleted rows, shuffle join beyond). ``with_meta`` keeps
    ``_file`` (basename) and ``_pos`` columns for position-aware
    callers (DV writes, change feeds)."""
    base_cols = [F.col(f.name) for f in st.fields]

    def _read(es: list[dict], need_meta: bool) -> DataFrame:
        df = spark.read.schema(st).parquet(*_abs_paths(root, es))
        if need_meta:
            return df.select(*base_cols, _file_base_col(), _row_pos_col())
        return df

    plain = [e for e in entries if "dv" not in e]
    dvd = [e for e in entries if "dv" in e]
    parts = []
    if plain:
        parts.append(_read(plain, with_meta))
    if dvd:
        df = _read(dvd, True)
        dv = _dv_rows(spark, root, dvd)
        n_dv = sum(e["dv"]["rows"] for e in dvd)
        if n_dv < 2_000_000:
            dv = F.broadcast(dv)
        df = df.join(
            dv,
            (F.col("_file") == F.col("file")) & (F.col("_pos") == F.col("pos")),
            "left_anti",
        )
        if not with_meta:
            df = df.drop("_file", "_pos")
        parts.append(df)
    if not parts:
        return spark.createDataFrame(
            [], _meta_schema(st) if with_meta else st
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# public API


def create_table(
    df: DataFrame,
    root: str,
    *,
    stat_cols: list[str] | None = None,
    checkpoint_every: int = 10,
    extra: dict | None = None,
    checks: dict[str, str] | None = None,
) -> int:
    """Version 0: write the initial snapshot. ``stat_cols`` declares the
    columns whose per-file min/max drive MERGE/DELETE file pruning.
    ``extra`` merges app-level metadata into the commit record (e.g. the
    IVM spec — see :mod:`.ivm`); it may not shadow core record keys.

    ``checks`` declares named SQL CHECK constraints (Delta's
    ``ADD CONSTRAINT``): every write path that introduces rows (create,
    append, MERGE batch) evaluates them in ONE aggregate job over the
    new rows and rejects the whole commit on any violation
    (:class:`CheckViolation` with per-constraint counts). SQL
    three-valued semantics: a row violates only when the expression is
    FALSE — NULL passes, as in standard CHECK."""
    if latest_version(root) >= 0:
        raise FileExistsError(f"table already exists at {root}")
    stat_cols = stat_cols or []
    checks = checks or {}
    if checks:
        _enforce_checks(df, checks)
    adds = _write_data_files(df, root, 0, stat_cols)
    record = {
        "version": 0,
        "action": "create",
        "add": adds,
        "remove": [],
        "schema": df.schema.json(),
        "stat_cols": stat_cols,
        "checkpoint_every": checkpoint_every,
        "checks": checks,
    }
    if extra:
        clash = set(extra) & set(record)
        if clash:
            raise ValueError(f"extra metadata shadows core keys: {sorted(clash)}")
        record.update(extra)
    _write_commit(root, 0, record)
    return 0


def _table_meta(root: str) -> dict:
    return _read_commit(root, 0)


class CheckViolation(ValueError):
    """A write batch broke a declared CHECK constraint; nothing was
    committed."""


def _enforce_checks(df: DataFrame, checks: dict[str, str]) -> None:
    """ONE aggregate job over the batch: per constraint, count rows
    where the expression is FALSE (NULL passes — SQL CHECK semantics).
    Raises :class:`CheckViolation` naming every violated constraint."""
    aggs = [
        F.count(F.when(F.expr(expr) == F.lit(False), 1)).alias(name)
        for name, expr in checks.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {n: row[n] for n in checks if row[n]}
    if bad:
        raise CheckViolation(
            "CHECK constraint(s) violated, commit rejected: "
            + ", ".join(
                f"{n} ({c} row(s), expr: {checks[n]!r})"
                for n, c in sorted(bad.items())
            )
        )


def table_checks(root: str) -> dict[str, str]:
    """The table's declared CHECK constraints (name → SQL expr)."""
    return dict(_table_meta(root).get("checks", {}))


def read_table(
    spark: SparkSession,
    root: str,
    *,
    version: int | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """Snapshot read, optionally time-travelled to ``version`` or to
    the newest commit at ``timestamp`` (``TIMESTAMP AS OF``)."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(root, timestamp)
    live, schema = snapshot_files(root, version)
    st = StructType.fromJson(schema)
    # schema evolution: files written before a column existed are read
    # with the committed (latest-at-version) schema; missing columns
    # come back null — parquet is schema-on-read. Deletion vectors are
    # applied inside read_files (merge-on-read).
    return read_files(spark, root, live, st)


def committed_batch_ids(root: str) -> set[int]:
    """Streaming batch ids already recorded in the commit log — the
    exactly-once ledger for :func:`streaming_sink` replays. Reads the
    newest consolidated checkpoint plus the commit suffix, so the
    per-micro-batch cost is O(checkpoint_every), not O(history)."""
    return _batch_ids_through(root, latest_version(root))


def _check_schema_widening(root: str, new) -> None:
    """Schema evolution guard: an append may ADD columns (old files read
    them back as NULL — parquet is schema-on-read) but may never drop or
    retype an existing column; that would silently narrow the committed
    schema and corrupt reads of every earlier file."""
    _live, cur = snapshot_files(root)
    cur_types = {f["name"]: f["type"] for f in cur["fields"]}
    new_types = {f.name: f.dataType.jsonValue() for f in new.fields}
    dropped = sorted(set(cur_types) - set(new_types))
    retyped = sorted(
        n for n, t in cur_types.items() if n in new_types and new_types[n] != t
    )
    if dropped or retyped:
        raise ValueError(
            f"append schema is not a widening of the table schema: "
            f"dropped={dropped} retyped={retyped}; cast/select to match "
            "(new columns may be added, existing ones never removed or "
            "retyped)"
        )


def append(
    df: DataFrame,
    root: str,
    *,
    batch_id: int | None = None,
    max_retries: int = 3,
) -> int:
    """Blind append — add-only commit, no files read or removed.
    ``batch_id`` makes streaming replays idempotent (see
    :func:`merge_upsert`). The batch schema must be a widening of the
    committed schema (see :func:`_check_schema_widening`).

    Optimistic concurrency, but cheaper than MERGE's: an append has no
    read-set, so a lost commit race reuses the already-staged data
    files verbatim and re-stamps only the commit record at the next
    version — an O(1) retry, no data rewrite. (The staged directory's
    ``v{N}`` prefix records the version the files were staged under,
    not necessarily the one that committed them; snapshot resolution
    reads only the log.)"""
    meta = _table_meta(root)
    if batch_id is not None and batch_id in committed_batch_ids(root):
        return latest_version(root)
    _check_schema_widening(root, df.schema)
    if meta.get("checks"):
        _enforce_checks(df, meta["checks"])
    v = latest_version(root) + 1
    adds = _write_data_files(df, root, v, meta["stat_cols"])
    for attempt in range(max_retries + 1):
        rec = {
            "version": v,
            "action": "append",
            "add": adds,
            "remove": [],
            "schema": df.schema.json(),
        }
        if batch_id is not None:
            rec["batch_id"] = batch_id
        try:
            _write_commit(root, v, rec)
            break
        except CommitConflict:
            if attempt == max_retries:
                raise
            if batch_id is not None and batch_id in committed_batch_ids(root):
                return latest_version(root)  # replay raced us in
            _check_schema_widening(root, df.schema)  # may have widened
            v = latest_version(root) + 1
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def _candidate_files(
    live: list[dict],
    bounds: dict[str, tuple],
    key_col: str,
    values: list | None = None,
) -> tuple[list[dict], list[dict]]:
    """Split live files into (candidates, untouched) via stats overlap
    with the update batch's [min,max] key range — or, when the exact
    ``values`` are known (IN-list predicates, small MERGE batches),
    per-value overlap: a sparse key set like {5, 999999} then prunes
    every file strictly between the two keys, where the convex hull
    would keep them all. A file with no stats for the key column is
    always a candidate (correctness first)."""
    if values is not None:
        import bisect

        vs = sorted(values)
        cands, rest = [], []
        for a in live:
            st = a.get("stats", {}).get(key_col)
            if st is None or st[0] is None:
                cands.append(a)
                continue
            # any value within [min, max]? binary-search the sorted set
            i = bisect.bisect_left(vs, st[0])
            (cands if i < len(vs) and vs[i] <= st[1] else rest).append(a)
        return cands, rest
    lo, hi = bounds[key_col]
    cands, rest = [], []
    for a in live:
        st = a.get("stats", {}).get(key_col)
        if st is None or st[0] is None:
            cands.append(a)
        elif st[0] <= hi and lo <= st[1]:
            cands.append(a)
        else:
            rest.append(a)
    return cands, rest


def merge_upsert(
    updates: DataFrame,
    root: str,
    *,
    key_col: str,
    max_retries: int = 3,
    batch_id: int | None = None,
    mode: str = "cow",
) -> int:
    """MERGE: rows in ``updates`` replace same-key rows, new keys are
    inserted. ``mode="cow"`` (default) is Delta's classic copy-on-write
    — only files whose [min,max] ``key_col`` range overlaps the batch
    are read and rewritten; the rest of the table is carried by
    reference. ``mode="mor"`` is Delta's DV-enabled MERGE: displaced
    rows are masked with deletion-vector sidecars and the update batch
    lands as NEW files — write cost is O(batch) + a sidecar, with ZERO
    rewrite of existing data files (a 10-row upsert into a 100 TB table
    writes 10 rows, not the gigabyte files holding the old versions);
    the read-side anti-join is reclaimed at the next compact. The
    change feed is exact under both modes (old row versions surface as
    ``deleted``, batch rows as ``inserted``).

    Retries on :class:`CommitConflict` against the refreshed snapshot
    (optimistic concurrency) — a cow loser re-writes the merged output
    in full before re-planning; a mor loser re-writes only the batch
    (O(batch), not O(candidate files) — the asymmetry that makes mor
    the cheap retry too). Orphans from lost races are
    :func:`vacuum`-reclaimed.

    Delta MERGE semantics on duplicate source keys: if ``updates``
    carries the same key twice the target row would be replaced by an
    arbitrary pair of rows, so (like Delta) this raises ``ValueError``
    instead of silently inserting both.

    ``batch_id`` (used by :func:`streaming_sink`) is recorded in the
    commit and makes replays idempotent: if any commit already carries
    this batch_id the merge is a no-op returning the current version.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    spark = updates.sparkSession
    meta = _table_meta(root)
    if key_col not in meta["stat_cols"]:
        raise ValueError(
            f"key_col {key_col!r} must be in stat_cols {meta['stat_cols']}"
        )
    if batch_id is not None and batch_id in committed_batch_ids(root):
        return latest_version(root)
    # r14: pin the batch ONCE — the merge evaluates `updates` four
    # times (dup check, bounds, exact-key collect, the merge itself),
    # and a caller-provided pipeline (filter over a scan, a join...)
    # otherwise re-runs per action (guide §1.2). O(batch) bytes, the
    # quantity MERGE is already proportional to.
    updates = updates.localCheckpoint(eager=True)
    # NULL keys are excluded from the uniqueness check: a NULL source
    # key never equi-matches a target row (SQL join semantics), so any
    # number of NULL-key rows are plain inserts, as in Delta's
    # whenNotMatched.
    dup = (
        updates.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter("_n > 1")
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"updates batch has multiple rows for {key_col}="
            f"{dup[0][key_col]!r}; MERGE requires unique source keys "
            "(dedupe the batch first)"
        )
    if meta.get("checks"):
        _enforce_checks(updates, meta["checks"])
    b = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(key_col).alias("lo"),
        F.max(key_col).alias("hi"),
    ).collect()[0]
    if b["n"] == 0:  # truly empty update batch: no-op, no commit
        return latest_version(root)
    # lo/hi None with n > 0 means every key is NULL: nothing can
    # equi-match, the whole batch is inserts (candidates prune to zero
    # via the empty exact-key set below).
    lo, hi = _json_stat(b["lo"]), _json_stat(b["hi"])
    # exact batch keys (bounded collect): per-value stats overlap prunes
    # sparse upserts far harder than the [lo, hi] hull — two keys at the
    # domain's ends touch 2 files, not every file between them.
    key_rows = updates.select(key_col).distinct().limit(10_001).collect()
    key_vals = (
        [_json_stat(r[key_col]) for r in key_rows if r[key_col] is not None]
        if len(key_rows) <= 10_000
        else None
    )
    for _ in range(max_retries):
        base_v = latest_version(root)
        live, _schema = snapshot_files(root, base_v)
        st = StructType.fromJson(_schema)
        cands, _rest = _candidate_files(
            live, {key_col: (lo, hi)}, key_col, values=key_vals
        )
        v = base_v + 1
        rec = {"version": v, "action": "merge", "schema": None,
               "write_mode": mode}
        if batch_id is not None:
            rec["batch_id"] = batch_id
        if mode == "cow":
            if cands:
                existing = read_files(spark, root, cands, st)
                keep = existing.join(
                    F.broadcast(updates.select(key_col).distinct()),
                    on=key_col,
                    how="left_anti",
                )
                merged = keep.unionByName(
                    updates.select(existing.columns),
                    allowMissingColumns=False,
                )
            else:
                merged = updates
            rec["add"] = _write_data_files(merged, root, v, meta["stat_cols"])
            rec["remove"] = [a["path"] for a in cands]
        else:
            mor_adds = _write_data_files(
                updates.select([f.name for f in st.fields]),
                root, v, meta["stat_cols"],
            )
            full, partial, dv_map = [], [], {}
            if cands:
                displaced = (
                    read_files(spark, root, cands, st, with_meta=True)
                    .join(
                        F.broadcast(updates.select(key_col).distinct()),
                        on=key_col,
                        how="left_semi",
                    )
                    .select("_file", "_pos")
                    .localCheckpoint(eager=True)  # counts + sidecar reuse
                )
                by_base = {os.path.basename(a["path"]): a for a in cands}
                per_file = {
                    r["_file"]: r["_n"]
                    for r in displaced.groupBy("_file")
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .collect()
                }
                for base, n_new in per_file.items():
                    a = by_base[base]
                    n_total = a.get("dv", {}).get("rows", 0) + n_new
                    (full if n_total == a["rows"] else partial).append(a)
                if partial:
                    partial_bases = [
                        os.path.basename(a["path"]) for a in partial
                    ]
                    cum = displaced.filter(
                        F.col("_file").isin(partial_bases)
                    ).select(
                        F.col("_file").alias("file"), F.col("_pos").alias("pos")
                    )
                    prior = [a for a in partial if "dv" in a]
                    if prior:
                        cum = cum.unionByName(_dv_rows(spark, root, prior))
                    sidecar = _write_dv_sidecar(cum, root, v)
                    for a in partial:
                        base = os.path.basename(a["path"])
                        dv_map[a["path"]] = {
                            "sidecar": sidecar,
                            "rows": a.get("dv", {}).get("rows", 0)
                            + per_file[base],
                        }
            rec["add"] = mor_adds
            rec["remove"] = [a["path"] for a in full]
            rec["dv"] = dv_map
        try:
            _write_commit(root, v, rec)
        except CommitConflict:
            # lose the race: orphan the just-written files (vacuum will
            # reclaim them) and re-plan against the new snapshot.
            continue
        _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
        return v
    raise CommitConflict(f"merge lost {max_retries} races at {root}")


_CMP_RE = r"(<=|>=|=|<|>)"


def _pred_literal(tok: str):
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
        inner = tok[1:-1]
        # Escaped quotes ('' / \' inside '...', "" / \" inside "...")
        # change the literal's VALUE; a naive strip would compare the
        # wrong string against file min/max stats and could unsoundly
        # prune a matching file. Pruning is an optimization — returning
        # None (no bound) is always sound, so bail instead of
        # attempting unescape. Only the literal's OWN quote char or a
        # backslash can be an escape: the opposite quote style is plain
        # data (`'say "hi"'` strips exactly), so it keeps its bound.
        if tok[0] in inner or "\\" in inner:
            return None
        return inner
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return None


def _mask_strings(predicate: str) -> tuple[str, list[str]]:
    """Replace every quoted literal with an indexed placeholder
    (``\\x00<i>\\x00``) so the bound-extraction regexes can never match
    comparator text INSIDE a string (e.g. ``note = 'id > 100'`` must
    not tighten ``id``'s bounds). Returns the masked predicate and the
    literal table; ``_pred_literal`` resolves placeholders back.

    SQL-escaped quotes are consumed as part of ONE literal: ``''`` /
    ``\\'`` inside single quotes (and ``\"\"`` / ``\\\"`` inside double
    quotes) no longer terminate the match, so ``note = 'it''s'`` masks
    as a single placeholder instead of two literals with live predicate
    text between them — which previously let comparator text inside the
    "gap" derive unsound stats-pruning bounds."""
    import re

    lits: list[str] = []

    def repl(m):
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return (
        re.sub(
            r"'(?:[^'\\]|''|\\.)*'|\"(?:[^\"\\]|\"\"|\\.)*\"",
            repl,
            predicate,
        ),
        lits,
    )


# quoted literals are masked to \x00<i>\x00 before regex scanning
_MASKED_LIT_RE = r"(\x00[0-9]+\x00|[-+]?[0-9]+(?:\.[0-9]+)?)"


def _extract_bounds(predicate: str, col: str):
    """Conservative [lo, hi] range ``col`` must satisfy for the
    predicate to hold, or ``None`` when no sound range exists.

    Handles the data-skipping subset real engines extract: top-level
    conjunctions of ``col <op> literal`` / ``literal <op> col`` /
    ``col BETWEEN a AND b`` / ``col IN (literals)``. Any disjunction or
    negation disables pruning entirely (correctness first) — a file is
    only ever skipped when its [min,max] cannot intersect the range.
    String literals are masked before scanning so comparator-looking
    text inside them can never produce unsound bounds."""
    import re

    predicate, str_lits = _mask_strings(predicate)
    up = f" {predicate.upper()} "
    if " OR " in up or " NOT " in up or "NOT(" in up.replace(" ", ""):
        return None
    c = re.escape(col)
    lo: object = None
    hi: object = None

    def lit_of(tok: str):
        tok = tok.strip()
        if tok.startswith("\x00"):
            return _pred_literal(str_lits[int(tok.strip("\x00"))])
        return _pred_literal(tok)

    def tighten(op: str, lit):
        nonlocal lo, hi
        if lit is None:
            return
        if op in ("<", "<="):
            hi = lit if hi is None else min(hi, lit)
        elif op in (">", ">="):
            lo = lit if lo is None else max(lo, lit)
        elif op == "=":
            lo = lit if lo is None else max(lo, lit)
            hi = lit if hi is None else min(hi, lit)

    lit_re = _MASKED_LIT_RE
    for op, tok in re.findall(rf"\b{c}\s*{_CMP_RE}\s*{lit_re}", predicate):
        tighten(op, lit_of(tok))
    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}
    for tok, op in re.findall(rf"{lit_re}\s*{_CMP_RE}\s*\b{c}\b", predicate):
        tighten(flip[op], lit_of(tok))
    m = re.search(
        rf"\b{c}\s+BETWEEN\s+{lit_re}\s+AND\s+{lit_re}",
        predicate,
        re.IGNORECASE,
    )
    if m:
        tighten(">=", lit_of(m.group(1)))
        tighten("<=", lit_of(m.group(2)))
    m = re.search(rf"\b{c}\s+IN\s*\(([^()]*)\)", predicate, re.IGNORECASE)
    if m:
        lits = [lit_of(t) for t in m.group(1).split(",")]
        if all(v is not None for v in lits) and lits:
            tighten(">=", min(lits))
            tighten("<=", max(lits))
    if lo is None and hi is None:
        return None
    return (lo, hi)


def _extract_in_values(predicate: str, col: str):
    """The exact value set ``col`` must belong to for the predicate to
    hold (``col IN (...)`` or ``col = lit`` conjuncts), or ``None``.
    Sound under conjunction (the set over-approximates the true keys);
    disjunction/negation disable it, like :func:`_extract_bounds`.
    String literals are masked first, so ``IN``/``=`` text inside a
    quoted value can never fabricate a key set."""
    import re

    predicate, str_lits = _mask_strings(predicate)
    up = f" {predicate.upper()} "
    if " OR " in up or " NOT " in up or "NOT(" in up.replace(" ", ""):
        return None

    def lit_of(tok: str):
        tok = tok.strip()
        if tok.startswith("\x00"):
            return _pred_literal(str_lits[int(tok.strip("\x00"))])
        return _pred_literal(tok)

    c = re.escape(col)
    m = re.search(rf"\b{c}\s+IN\s*\(([^()]*)\)", predicate, re.IGNORECASE)
    if m:
        lits = [lit_of(t) for t in m.group(1).split(",")]
        if lits and all(v is not None for v in lits):
            return lits
    m = re.search(rf"\b{c}\s*=\s*{_MASKED_LIT_RE}", predicate)
    if m:
        v = lit_of(m.group(1))
        if v is not None:
            return [v]
    return None


def delete_where(
    spark: SparkSession,
    root: str,
    predicate: str,
    *,
    prune_col: str | None = None,
    mode: str = "cow",
    max_retries: int = 3,
) -> int:
    """Delete matching rows. ``mode="cow"`` (default) is copy-on-write
    at file granularity; ``mode="mor"`` is merge-on-read via deletion
    vectors — matched row positions land in a tiny parquet sidecar and
    the data files are NOT rewritten (Delta DVs / Iceberg v2 position
    deletes: the right shape for point/small deletes at 100 TB, where
    rewriting a 1 GB file to drop 5 rows is the wrong cost model; the
    next compact/cluster rewrite applies and clears the vectors). A
    file whose every row is deleted is removed outright in either mode.

    Three tiers of work avoidance, each sound:

    1. **Stats pruning (no read)** — with ``prune_col``, the predicate's
       implied [lo, hi] range on that column (see
       :func:`_extract_bounds`) is intersected with each file's
       committed [min,max]; a file that cannot overlap is carried by
       reference without being opened.
    2. **Match detection (one job)** — all surviving candidates are
       scanned in a SINGLE Spark job tagged with parquet row positions;
       a candidate with no matching row is also carried by reference.
    3. **Write (one job)** — cow rewrites the kept rows of all matched
       files together; mor writes one cumulative sidecar for all
       partially-matched files.

    Optimistic concurrency (same contract as :func:`merge_upsert`): a
    lost commit race re-plans against the refreshed snapshot; the
    loser's staged files become vacuum-reclaimable orphans.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    meta = _table_meta(root)
    for _ in range(max_retries):
        try:
            return _delete_attempt(spark, root, predicate, prune_col, mode, meta)
        except CommitConflict:
            continue
    raise CommitConflict(f"delete lost {max_retries} races at {root}")


def _prune_by_predicate(
    live: list[dict], predicate: str, prune_col: str | None
) -> list[dict]:
    """Candidate files for a predicate via stats: exact value-set
    overlap when the predicate pins an IN-list / equality on
    ``prune_col`` (sparse keys skip everything between), else the
    conservative [lo, hi] hull; no ``prune_col`` → every live file."""
    if not prune_col:
        return live
    in_vals = _extract_in_values(predicate, prune_col)
    if in_vals is not None:
        cands, _rest = _candidate_files(
            live, {}, prune_col, values=[_json_stat(v) for v in in_vals]
        )
        return cands
    bounds = _extract_bounds(predicate, prune_col)
    if bounds is None:
        return live
    lo, hi = bounds
    out = []
    for a in live:
        stat = a.get("stats", {}).get(prune_col)
        if stat is None or stat[0] is None:
            out.append(a)
        elif (hi is None or stat[0] <= hi) and (lo is None or lo <= stat[1]):
            out.append(a)
    return out


def _delete_attempt(
    spark: SparkSession,
    root: str,
    predicate: str,
    prune_col: str | None,
    mode: str,
    meta: dict,
) -> int:
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    st = StructType.fromJson(_schema)
    cands = _prune_by_predicate(live, predicate, prune_col)
    if not cands:
        return base_v
    # one job over the candidates — DV-aware, so rows already deleted
    # by an earlier merge-on-read commit can't match again.
    tagged = read_files(spark, root, cands, st, with_meta=True)
    matched = tagged.filter(predicate).select("_file", "_pos")
    if mode == "mor":
        # pin once: the per-file counts job AND the sidecar write both
        # consume `matched` (same pattern as merge/update mor paths)
        matched = matched.localCheckpoint(eager=True)
    by_base = {os.path.basename(a["path"]): a for a in cands}

    if mode == "cow":
        matched_bases = {
            r["_file"] for r in matched.select("_file").distinct().collect()
        }
        if not matched_bases:
            return base_v
        hit = [by_base[b] for b in sorted(matched_bases)]
        v = base_v + 1
        # NOT(pred) alone would also drop rows where pred is NULL
        # (three-valued logic) — only TRUE rows are deleted, so keep
        # everything that is not definitely matched.
        kept = read_files(spark, root, hit, st).filter(
            f"NOT coalesce(({predicate}), false)"
        )
        adds = _write_data_files(kept, root, v, meta["stat_cols"])
        _write_commit(
            root,
            v,
            {"version": v, "action": "delete", "add": adds,
             "remove": [a["path"] for a in hit], "schema": None,
             "write_mode": "cow"},
        )
        _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
        return v

    # --- merge-on-read ---
    per_file = {
        r["_file"]: r["_n"]
        for r in matched.groupBy("_file")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    if not per_file:
        return base_v
    full, partial = [], []
    for base, n_new in per_file.items():
        a = by_base[base]
        n_total = a.get("dv", {}).get("rows", 0) + n_new
        (full if n_total == a["rows"] else partial).append(a)
    v = base_v + 1
    dv_map: dict[str, dict] = {}
    if partial:
        partial_bases = [os.path.basename(a["path"]) for a in partial]
        # cumulative sidecar: new matches + the files' prior DV rows
        cum = matched.filter(F.col("_file").isin(partial_bases)).select(
            F.col("_file").alias("file"), F.col("_pos").alias("pos")
        )
        prior = [a for a in partial if "dv" in a]
        if prior:
            cum = cum.unionByName(_dv_rows(spark, root, prior))
        sidecar = _write_dv_sidecar(cum, root, v)
        for a in partial:
            base = os.path.basename(a["path"])
            dv_map[a["path"]] = {
                "sidecar": sidecar,
                "rows": a.get("dv", {}).get("rows", 0) + per_file[base],
            }
    _write_commit(
        root,
        v,
        {"version": v, "action": "delete", "add": [],
         "remove": [a["path"] for a in full], "dv": dv_map, "schema": None,
         "write_mode": "mor"},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def update_where(
    spark: SparkSession,
    root: str,
    predicate: str,
    assignments: dict[str, str],
    *,
    prune_col: str | None = None,
    mode: str = "cow",
    max_retries: int = 3,
) -> int:
    """Delta ``UPDATE table SET col = expr WHERE predicate``. Matched
    rows get each assignment expression applied (exprs see the OLD row
    — standard UPDATE semantics, so swaps like ``{"a": "b", "b": "a"}``
    behave); unmatched rows pass through untouched.

    ``mode="cow"`` rewrites only the files containing matches (stats
    pruning + one match-detection job, like :func:`delete_where`).
    ``mode="mor"`` masks the matched rows' positions with a
    deletion-vector sidecar and lands the updated versions as NEW files
    — O(matched rows) written, zero rewrite of existing files, exact
    under the streaming change feed (the mor-update commit is adds +
    DV diffs, both file-local). CHECK constraints are enforced on the
    updated rows; no-op (no commit) when nothing matches."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    meta = _table_meta(root)
    for _ in range(max_retries):
        try:
            return _update_attempt(
                spark, root, predicate, assignments, prune_col, mode, meta
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"update lost {max_retries} races at {root}")


def _update_attempt(
    spark, root, predicate, assignments, prune_col, mode, meta
) -> int:
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    st = StructType.fromJson(_schema)
    names = set(st.fieldNames())
    bad = sorted(set(assignments) - names)
    if bad:
        raise ValueError(f"assignment targets not in schema: {bad}")

    def _apply(df: DataFrame) -> DataFrame:
        # all exprs evaluate against the OLD row: single select
        return df.select(
            *[
                F.expr(assignments[f.name]).cast(f.dataType).alias(f.name)
                if f.name in assignments
                else F.col(f.name)
                for f in st.fields
            ]
        )

    cands = _prune_by_predicate(live, predicate, prune_col)
    if not cands:
        return base_v
    tagged = read_files(spark, root, cands, st, with_meta=True)
    matched = tagged.filter(predicate)
    by_base = {os.path.basename(a["path"]): a for a in cands}
    v = base_v + 1

    if mode == "cow":
        matched_bases = {
            r["_file"]
            for r in matched.select("_file").distinct().collect()
        }
        if not matched_bases:
            return base_v
        hit = [by_base[b] for b in sorted(matched_bases)]
        old = read_files(spark, root, hit, st)
        updated_part = _apply(old.filter(predicate))
        if meta.get("checks"):
            _enforce_checks(updated_part, meta["checks"])
        # coalesce: a NULL predicate row is UNMATCHED (kept as-is), not
        # silently dropped by NOT(NULL) three-valued logic
        rewritten = old.filter(
            f"NOT coalesce(({predicate}), false)"
        ).unionByName(updated_part)
        adds = _write_data_files(rewritten, root, v, meta["stat_cols"])
        _write_commit(
            root,
            v,
            {"version": v, "action": "update", "add": adds,
             "remove": [a["path"] for a in hit], "schema": None,
             "write_mode": "cow"},
        )
        _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
        return v

    # --- merge-on-read: mask old versions, append new versions ---
    matched = matched.localCheckpoint(eager=True)  # mask + rewrite reuse
    per_file = {
        r["_file"]: r["_n"]
        for r in matched.groupBy("_file")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    if not per_file:
        return base_v
    updated = _apply(matched.drop("_file", "_pos"))
    if meta.get("checks"):
        _enforce_checks(updated, meta["checks"])
    adds = _write_data_files(updated, root, v, meta["stat_cols"])
    full, partial, dv_map = [], [], {}
    for base, n_new in per_file.items():
        a = by_base[base]
        n_total = a.get("dv", {}).get("rows", 0) + n_new
        (full if n_total == a["rows"] else partial).append(a)
    if partial:
        partial_bases = [os.path.basename(a["path"]) for a in partial]
        cum = matched.filter(F.col("_file").isin(partial_bases)).select(
            F.col("_file").alias("file"), F.col("_pos").alias("pos")
        )
        prior = [a for a in partial if "dv" in a]
        if prior:
            cum = cum.unionByName(_dv_rows(spark, root, prior))
        sidecar = _write_dv_sidecar(cum, root, v)
        for a in partial:
            base = os.path.basename(a["path"])
            dv_map[a["path"]] = {
                "sidecar": sidecar,
                "rows": a.get("dv", {}).get("rows", 0) + per_file[base],
            }
    _write_commit(
        root,
        v,
        {"version": v, "action": "update", "add": adds,
         "remove": [a["path"] for a in full], "dv": dv_map, "schema": None,
         "write_mode": "mor"},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def compact_small(
    spark: SparkSession,
    root: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    max_dv_fraction: float = 0.3,
) -> int:
    """Size-tiered OPTIMIZE: rewrite ONLY the live files smaller than
    ``target_bytes // 2`` into ~``target_bytes`` outputs, carrying every
    right-sized file by reference (never read, never written). This is
    the operational companion to :func:`streaming_sink` — many
    micro-batch appends each land a small file, and full :func:`compact`
    would rewrite the whole table per invocation (O(table) churn for an
    O(new-smalls) problem). Data-identical commit (a version diff is
    empty); no-op (no commit) when fewer than ``min_files`` small files
    exist. At 100 TB: cost ∝ accumulated small bytes, not table size.

    Deletion-vector debt: a file whose DV masks more than
    ``max_dv_fraction`` of its rows is also rewritten regardless of
    size — every read pays the anti-join for rows that are mostly dead
    (Delta's tombstone-ratio OPTIMIZE heuristic); the rewrite applies
    and clears the vector.

    Optimistic concurrency like every other writer: a lost commit race
    re-plans against the refreshed snapshot instead of propagating —
    essential for :func:`streaming_sink`'s ``compact_every``, where an
    exception would kill the streaming query over a benign race."""
    for _ in range(3):
        try:
            return _compact_small_attempt(
                spark, root, target_bytes, min_files, max_dv_fraction
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"compact_small lost 3 races at {root}")


def _compact_small_attempt(
    spark, root, target_bytes, min_files, max_dv_fraction
) -> int:
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    def _dv_debt(a):
        return (
            "dv" in a
            and a.get("rows")
            and a["dv"]["rows"] / a["rows"] > max_dv_fraction
        )

    small = [
        a
        for a in live
        if os.path.getsize(os.path.join(root, a["path"])) < target_bytes // 2
        or _dv_debt(a)
    ]
    # a single mostly-dead file is worth rewriting on its own; pure
    # small-file accumulation still waits for min_files
    if len(small) < min_files and not any(_dv_debt(a) for a in small):
        return base_v
    total = sum(os.path.getsize(os.path.join(root, a["path"])) for a in small)
    n_out = max(1, round(total / target_bytes))
    df = read_files(
        spark, root, small, StructType.fromJson(_schema)
    ).coalesce(n_out)
    v = base_v + 1
    adds = _write_data_files(df, root, v, meta["stat_cols"])
    _write_commit(
        root,
        v,
        {"version": v, "action": "compact", "add": adds,
         "remove": [a["path"] for a in small], "schema": None},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def compact(spark: SparkSession, root: str, *, target_files: int = 1) -> int:
    """OPTIMIZE: rewrite the live set into ``target_files`` files —
    data-identical (a diff between the two versions is empty), so small
    files from many appends stop taxing every scan. Lost commit races
    re-plan against the refreshed snapshot (a racing delete may have
    removed an input file — committing the stale rewrite would
    resurrect its rows, so the retry rebuilds from scratch)."""
    for _ in range(3):
        try:
            return _compact_attempt(spark, root, target_files)
        except CommitConflict:
            continue
    raise CommitConflict(f"compact lost 3 races at {root}")


def _compact_attempt(spark, root, target_files) -> int:
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    df = read_files(
        spark, root, live, StructType.fromJson(_schema)
    ).coalesce(target_files)
    v = base_v + 1
    adds = _write_data_files(df, root, v, meta["stat_cols"])
    _write_commit(
        root,
        v,
        {"version": v, "action": "compact", "add": adds,
         "remove": [a["path"] for a in live], "schema": None},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def optimize_cluster(
    spark: SparkSession, root: str, by: list[str], *, target_files: int = 8
) -> int:
    """CLUSTER BY / Z-ORDER rewrite: data-identical (a version diff is
    empty), but the live set is rewritten range-partitioned + sorted on
    the clustering key so per-file [min,max] stats become near-disjoint
    — the layout move that turns :func:`merge_upsert` /
    :func:`delete_where` stats pruning from "no file excluded" (keys
    scattered, every file spans the full range) into "all but one file
    excluded". One column sorts directly; two columns interleave into a
    Morton Z-value (``layout.zorder_value``) so stats prune on EITHER
    column. One shuffle (the range partitioner), one write. Lost commit
    races re-plan against the refreshed snapshot (same rationale as
    :func:`compact`)."""
    if not 1 <= len(by) <= 4:
        raise ValueError(
            "cluster by 1 column (sort), 2 (Z-order) or up to 4 "
            "(N-way Morton; resolution drops past that)"
        )
    for _ in range(3):
        try:
            return _optimize_cluster_attempt(spark, root, by, target_files)
        except CommitConflict:
            continue
    raise CommitConflict(f"optimize_cluster lost 3 races at {root}")


def _optimize_cluster_attempt(spark, root, by, target_files) -> int:
    from . import layout

    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    df = read_files(spark, root, live, StructType.fromJson(_schema))
    key = (
        F.col(by[0])
        if len(by) == 1
        else layout.zorder_value(by[0], by[1])
        if len(by) == 2
        else layout.zorder_value_n(by)
    )
    clustered = (
        df.withColumn("_ck", key)
        .repartitionByRange(target_files, "_ck")
        .sortWithinPartitions("_ck")
        .drop("_ck")
    )
    v = base_v + 1
    adds = _write_data_files(clustered, root, v, meta["stat_cols"])
    _write_commit(
        root,
        v,
        {"version": v, "action": "cluster", "add": adds,
         "remove": [a["path"] for a in live], "schema": None},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def table_changes(
    spark: SparkSession, root: str, v_from: int, v_to: int
) -> DataFrame:
    """Batch change-data-feed (Delta ``table_changes``): row-level
    changes per commit over (``v_from``, ``v_to``], each tagged with
    ``_commit_version`` and ``_change_type`` ∈ {inserted, deleted} —
    an update is one deleted + one inserted row at the same version.
    Churn-proportional, never a snapshot re-scan: files carried across
    a commit cancel in the multiset difference — elementwise
    ``(C+A) ∸ (C+R) = A ∸ R`` — so each version reads ONLY its own
    added/removed files. Every data file is immutable parquet, so the
    feed is deterministic and replayable from any version.

    Deletion-vector commits (``delete_where(mode="mor")``) emit exactly
    the NEWLY masked rows: the commit's cumulative sidecar minus the
    file's prior sidecar gives the fresh positions, and the data file
    is read once at those positions. A later REMOVE of a DV'd file
    (compact, merge, cow delete) reads it through its pre-commit DV, so
    rows already reported deleted are never reported twice — the feed
    stays an exact multiset delta of the logical table at every
    version."""
    head = latest_version(root)
    if not 0 <= v_from < v_to <= head:
        raise ValueError(
            f"need 0 <= v_from < v_to <= head({head}), "
            f"got ({v_from}, {v_to}]"
        )
    _live, schema = snapshot_files(root, v_to)
    st = StructType.fromJson(schema)
    base_cols = [F.col(f.name) for f in st.fields]
    # rolling pre-commit state: removed paths and DV diffs need the
    # entry (with its OLD deletion vector) as of the previous version.
    pre = {a["path"]: a for a in snapshot_files(root, v_from)[0]}

    def _side(entries: list[dict]) -> DataFrame:
        if not entries:
            return spark.createDataFrame([], st)
        return read_files(spark, root, entries, st)

    out = None
    for v in range(v_from + 1, v_to + 1):
        rec = _read_commit(root, v)
        added_entries = rec.get("add", [])
        removed_entries = [
            pre[p] for p in rec.get("remove", []) if p in pre
        ]
        added = _side(added_entries)
        removed = _side(removed_entries)
        # exceptAll is a full-width multiset shuffle — only mixed
        # add+remove commits (merge, compact, cow delete rewrites) need
        # the cancellation; append-only and remove-only commits get the
        # identity short-circuit (exceptAll with an empty side IS the
        # other side), which removed ~2 s per append fold from every
        # IVM refresh at sf0.1 (r13 latency campaign)
        action = rec.get("action")
        if not removed_entries:
            d = added.withColumn("_change_type", F.lit("inserted"))
        elif not added_entries:
            d = removed.withColumn("_change_type", F.lit("deleted"))
        elif action in ("compact", "cluster"):
            # layout-only commits rewrite the SAME logical rows (DV
            # masks applied on both sides), so the two exceptAll
            # shuffles always cancelled to an empty feed — emit it
            # directly
            d = spark.createDataFrame([], st).withColumn(
                "_change_type", F.lit("inserted")
            )
        elif action == "delete":
            # copy-on-write delete: added files are survivor subsets
            # of the removed files, so the inserted side is empty by
            # construction — one exceptAll instead of two
            d = removed.exceptAll(added).withColumn(
                "_change_type", F.lit("deleted")
            )
        else:
            d = (
                added.exceptAll(removed)
                .withColumn("_change_type", F.lit("inserted"))
                .unionByName(
                    removed.exceptAll(added)
                    .withColumn("_change_type", F.lit("deleted"))
                )
            )
        dv_items = rec.get("dv", {})
        if dv_items:
            new_entries = [
                {**pre[p], "dv": {"sidecar": d2["sidecar"], "rows": d2["rows"]}}
                for p, d2 in dv_items.items()
                if p in pre
            ]
            fresh = _dv_rows(spark, root, new_entries)
            old_dvd = [pre[p] for p in dv_items if "dv" in pre.get(p, {})]
            if old_dvd:
                fresh = fresh.join(
                    _dv_rows(spark, root, old_dvd), ["file", "pos"], "left_anti"
                )
            # read the affected files WITHOUT their (new) DV, positions on
            bare = [
                {k: val for k, val in pre[p].items() if k != "dv"}
                for p in dv_items
                if p in pre
            ]
            data = spark.read.schema(st).parquet(
                *_abs_paths(root, bare)
            ).select(*base_cols, _file_base_col(), _row_pos_col())
            masked = (
                data.join(
                    F.broadcast(fresh),
                    (F.col("_file") == F.col("file"))
                    & (F.col("_pos") == F.col("pos")),
                    "left_semi",
                )
                .drop("_file", "_pos")
                .withColumn("_change_type", F.lit("deleted"))
            )
            d = d.unionByName(masked)
        d = d.withColumn("_commit_version", F.lit(v).cast("long"))
        out = d if out is None else out.unionByName(d)
        # roll the pre-state forward past this commit
        for p in rec.get("remove", []):
            pre.pop(p, None)
        for a in added_entries:
            pre[a["path"]] = a
        for p, d2 in dv_items.items():
            if p in pre:
                pre[p] = {
                    **pre[p],
                    "dv": {"sidecar": d2["sidecar"], "rows": d2["rows"]},
                }
    return out


def table_diff(
    spark: SparkSession, root: str, v_old: int, v_new: int
) -> DataFrame:
    """Row-level diff between two versions: ``change_type`` ∈
    {inserted, deleted} under multiset semantics (exceptAll both ways).
    An update surfaces as one deleted + one inserted row."""
    old = read_table(spark, root, version=v_old)
    new = read_table(spark, root, version=v_new)
    return new.exceptAll(old).withColumn(
        "change_type", F.lit("inserted")
    ).unionByName(
        old.exceptAll(new).withColumn("change_type", F.lit("deleted"))
    )


def restore_table(root: str, version: int) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION``: make the head snapshot
    equal an earlier version by ROLLING FORWARD — a new commit
    re-references the old files (and their deletion-vector state), so
    history is preserved and a bad write is undone without rewriting
    anything. Zero data I/O: the commit carries only metadata.

    Change-feed exactness: only entries that DIFFER from the head's
    (new files, or same path with different DV state) are re-added, and
    every differing-or-dropped path is removed first — so
    :func:`table_changes` across the restore commit reports exactly the
    logical diff (undeleted rows come back as ``inserted``), not a
    re-insert of the whole table.

    Raises ``FileNotFoundError`` if :func:`vacuum` already reclaimed a
    file the target version references (the standard lakehouse
    restore/retention contract). A lost commit race re-plans the diff
    against the new head (restore wins — the table still ends at the
    target version's state)."""
    for _ in range(3):
        try:
            return _restore_attempt(root, version)
        except CommitConflict:
            continue
    raise CommitConflict(f"restore lost 3 races at {root}")


def _restore_attempt(root: str, version: int) -> int:
    head = latest_version(root)
    if not 0 <= version <= head:
        raise ValueError(f"version {version} out of range [0, {head}]")
    target_live, target_schema = snapshot_files(root, version)
    missing = [
        p
        for a in target_live
        for p in [a["path"]] + ([a["dv"]["sidecar"]] if "dv" in a else [])
        if not os.path.exists(os.path.join(root, p))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore {root} to v{version}: vacuum reclaimed "
            f"{len(missing)} referenced file(s), e.g. {missing[:3]}"
        )
    head_live, _ = snapshot_files(root, head)
    head_by_path = {a["path"]: a for a in head_live}
    target_by_path = {a["path"]: a for a in target_live}
    adds = [
        a for a in target_live if head_by_path.get(a["path"]) != a
    ]
    removes = sorted(
        set(head_by_path) - set(target_by_path)
        | {a["path"] for a in adds if a["path"] in head_by_path}
    )
    v = head + 1
    _write_commit(
        root,
        v,
        {"version": v, "action": "restore", "add": adds, "remove": removes,
         "schema": json.dumps(target_schema), "restore_of": version},
    )
    _maybe_checkpoint(root, v, _table_meta(root).get("checkpoint_every", 10))
    return v


def vacuum(
    root: str, *, retain_versions: int = 0, min_age_seconds: float = 0.0
) -> list[str]:
    """Delete data files unreferenced by the retained version range
    (head − retain_versions … head) — including orphans from lost
    commit races. Returns the deleted relative paths. Time travel
    before the retained range stops working, as in any lakehouse.

    ``min_age_seconds`` is the concurrent-writer guard: a writer stages
    its data files BEFORE winning the commit race (see
    :func:`merge_upsert`), so an unreferenced file younger than the
    window may belong to an in-flight commit and is skipped (mtime
    check — the same contract as Delta's retention period). The default
    0.0 is only safe when no writer is concurrently active; production
    callers should pass a window larger than their longest commit."""
    import time

    head = latest_version(root)
    keep: set[str] = set()
    for v in range(max(0, head - retain_versions), head + 1):
        live, _ = snapshot_files(root, v)
        keep.update(a["path"] for a in live)
        keep.update(a["dv"]["sidecar"] for a in live if "dv" in a)
    deleted = []
    now = time.time()
    data_root = os.path.join(root, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for fname in files:
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, root)
            if rel in keep or not fname.endswith(".parquet"):
                continue
            try:
                if (
                    min_age_seconds > 0
                    and now - os.path.getmtime(full) < min_age_seconds
                ):
                    continue
                os.remove(full)
            except OSError:
                continue  # raced another vacuum / an in-flight rename
            deleted.append(rel)
    # Drop version dirs that hold no parquet anywhere — Spark's
    # _SUCCESS/.crc markers don't count, or fully-vacuumed dirs would
    # leak forever. The sweep honors the SAME age guard as the file
    # loop: a concurrent writer creates its staging dir before any
    # .parquet lands in it (Spark parks task output under _temporary/
    # first), so a young parquet-free dir may be an in-flight commit —
    # rmtree'ing it kills the writer mid-write (caught by the
    # multi-writer interleaving test). Note the file loop above updates
    # the dir's mtime when it removes files, so under a guard a
    # just-emptied dir is reclaimed by a LATER vacuum once it has been
    # quiet for the window — eventual cleanup, never a racy one.
    for d in sorted(os.listdir(data_root)):
        full = os.path.join(data_root, d)
        if not os.path.isdir(full):
            continue
        try:
            if any(
                f.endswith(".parquet")
                for _p, _sub, files in os.walk(full)
                for f in files
            ):
                continue  # still referenced or in-flight data
            if (
                min_age_seconds > 0
                and now - os.path.getmtime(full) < min_age_seconds
            ):
                continue  # may belong to an in-flight commit
            shutil.rmtree(full)
        except OSError:
            continue
    return sorted(deleted)


def streaming_sink(
    root: str,
    *,
    key_col: str | None = None,
    compact_every: int = 0,
    compact_target_bytes: int = 128 * 1024 * 1024,
    merge_mode: str = "cow",
):
    """``foreachBatch`` function writing a stream into the table with
    exactly-once semantics: the micro-batch id is recorded in the
    commit, so a crash between sink commit and Spark's checkpoint
    advance — which makes Structured Streaming REPLAY the batch — hits
    the :func:`committed_batch_ids` ledger and becomes a no-op instead
    of a duplicate. ``key_col`` switches from append to
    :func:`merge_upsert` (streaming CDC upsert; batch must be
    key-unique — dedupe upstream, e.g. a last-per-key window).

    ``merge_mode="mor"`` makes each CDC upsert a deletion-vector merge
    (O(batch) write, zero rewrite of existing files — the right sink
    shape for high-frequency micro-batches against a huge table);
    pair it with ``compact_every`` so accumulated vectors and small
    files are both reclaimed on the same cadence.

    ``compact_every=N`` runs :func:`compact_small` after every Nth
    batch — micro-batch appends each land a small file, and unbounded
    accumulation taxes every later scan. The compaction is data-identical
    and safely replayable (it carries no batch id; re-running it is just
    another no-op-or-merge), so exactly-once delivery is unaffected.

    Usage::

        q = (df.writeStream.foreachBatch(streaming_sink(root))
               .option("checkpointLocation", ckpt).start())
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if key_col is None:
            append(batch_df, root, batch_id=batch_id)
        else:
            merge_upsert(batch_df, root, key_col=key_col, batch_id=batch_id,
                         mode=merge_mode)
        if compact_every > 0 and batch_id % compact_every == compact_every - 1:
            compact_small(
                batch_df.sparkSession, root, target_bytes=compact_target_bytes
            )

    return _sink
