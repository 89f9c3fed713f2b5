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
    """Exclusive-create the commit file — the one atomic step."""
    os.makedirs(_log_dir(root), exist_ok=True)
    path = _commit_path(root, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed at {path}"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(record, f, sort_keys=True)


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
            }
        )
    return out


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
        if rec.get("schema"):
            schema = rec["schema"]
    return sorted(live.values(), key=lambda a: a["path"]), json.loads(schema)


def _maybe_checkpoint(root: str, version: int, checkpoint_every: int) -> None:
    if checkpoint_every <= 0 or version == 0 or version % checkpoint_every:
        return
    live, schema = snapshot_files(root, version)
    with open(_checkpoint_path(root, version), "w") as f:
        json.dump({"version": version, "live": live, "schema": json.dumps(schema)}, f)


# --------------------------------------------------------------------------
# data-file helpers


def _write_data_files(
    df: DataFrame, root: str, version: int, stat_cols: list[str]
) -> list[dict]:
    """Write ``df`` as immutable parquet under ``data/v{version}-<uuid>/``
    and return add-entries with per-file row counts and min/max stats.

    The stats agg runs over the files just written (grouped by
    ``input_file_name``) — one scan of the NEW bytes only, the same
    footer-level bookkeeping parquet writers do; never over the table.
    """
    rel = f"data/v{version:08d}-{uuid.uuid4().hex[:8]}"
    out_dir = os.path.join(root, rel)
    df.write.mode("error").parquet(out_dir)
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
# public API


def create_table(
    df: DataFrame,
    root: str,
    *,
    stat_cols: list[str] | None = None,
    checkpoint_every: int = 10,
    extra: dict | None = None,
) -> int:
    """Version 0: write the initial snapshot. ``stat_cols`` declares the
    columns whose per-file min/max drive MERGE/DELETE file pruning.
    ``extra`` merges app-level metadata into the commit record (e.g. the
    IVM spec — see :mod:`.ivm`); it may not shadow core record keys."""
    if latest_version(root) >= 0:
        raise FileExistsError(f"table already exists at {root}")
    stat_cols = stat_cols or []
    adds = _write_data_files(df, root, 0, stat_cols)
    record = {
        "version": 0,
        "action": "create",
        "add": adds,
        "remove": [],
        "schema": df.schema.json(),
        "stat_cols": stat_cols,
        "checkpoint_every": checkpoint_every,
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


def read_table(
    spark: SparkSession, root: str, *, version: int | None = None
) -> DataFrame:
    """Snapshot read, optionally time-travelled to ``version``."""
    live, schema = snapshot_files(root, version)
    st = StructType.fromJson(schema)
    if not live:
        return spark.createDataFrame([], st)
    reader = spark.read
    # schema evolution: files written before a column existed are read
    # with the committed (latest-at-version) schema; missing columns
    # come back null — parquet is schema-on-read.
    return reader.schema(st).parquet(*_abs_paths(root, live))


def committed_batch_ids(root: str) -> set[int]:
    """Streaming batch ids already recorded in the commit log — the
    exactly-once ledger for :func:`streaming_sink` replays."""
    out: set[int] = set()
    for v in range(latest_version(root) + 1):
        rec = _read_commit(root, v)
        if "batch_id" in rec:
            out.add(rec["batch_id"])
    return out


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


def append(df: DataFrame, root: str, *, batch_id: int | None = None) -> int:
    """Blind append — add-only commit, no files read or removed.
    ``batch_id`` makes streaming replays idempotent (see
    :func:`merge_upsert`). The batch schema must be a widening of the
    committed schema (see :func:`_check_schema_widening`)."""
    meta = _table_meta(root)
    if batch_id is not None and batch_id in committed_batch_ids(root):
        return latest_version(root)
    _check_schema_widening(root, df.schema)
    v = latest_version(root) + 1
    adds = _write_data_files(df, root, v, meta["stat_cols"])
    rec = {
        "version": v,
        "action": "append",
        "add": adds,
        "remove": [],
        "schema": df.schema.json(),
    }
    if batch_id is not None:
        rec["batch_id"] = batch_id
    _write_commit(root, v, rec)
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def _candidate_files(
    live: list[dict], bounds: dict[str, tuple], key_col: str
) -> tuple[list[dict], list[dict]]:
    """Split live files into (candidates, untouched) via stats overlap
    with the update batch's [min,max] key range. A file with no stats
    for the key column is always a candidate (correctness first)."""
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
) -> int:
    """Copy-on-write MERGE: rows in ``updates`` replace same-key rows,
    new keys are inserted. Only files whose [min,max] ``key_col`` range
    overlaps the batch are read and rewritten; the rest of the table is
    carried by reference. Retries on :class:`CommitConflict` against
    the refreshed snapshot (optimistic concurrency) — note a lost race
    re-writes the merged output in full before re-planning; the loser's
    first attempt becomes orphan files that :func:`vacuum` reclaims.

    Delta MERGE semantics on duplicate source keys: if ``updates``
    carries the same key twice the target row would be replaced by an
    arbitrary pair of rows, so (like Delta) this raises ``ValueError``
    instead of silently inserting both.

    ``batch_id`` (used by :func:`streaming_sink`) is recorded in the
    commit and makes replays idempotent: if any commit already carries
    this batch_id the merge is a no-op returning the current version.
    """
    spark = updates.sparkSession
    meta = _table_meta(root)
    if key_col not in meta["stat_cols"]:
        raise ValueError(
            f"key_col {key_col!r} must be in stat_cols {meta['stat_cols']}"
        )
    if batch_id is not None and batch_id in committed_batch_ids(root):
        return latest_version(root)
    dup = (
        updates.groupBy(key_col)
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
    b = updates.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    if b["lo"] is None:  # empty update batch: no-op, no commit
        return latest_version(root)
    lo, hi = _json_stat(b["lo"]), _json_stat(b["hi"])
    for _ in range(max_retries):
        base_v = latest_version(root)
        live, _schema = snapshot_files(root, base_v)
        cands, _rest = _candidate_files(live, {key_col: (lo, hi)}, key_col)
        if cands:
            existing = spark.read.parquet(*_abs_paths(root, cands))
            keep = existing.join(
                F.broadcast(updates.select(key_col).distinct()),
                on=key_col,
                how="left_anti",
            )
            merged = keep.unionByName(
                updates.select(existing.columns), allowMissingColumns=False
            )
        else:
            merged = updates
        v = base_v + 1
        adds = _write_data_files(merged, root, v, meta["stat_cols"])
        try:
            rec = {
                "version": v,
                "action": "merge",
                "add": adds,
                "remove": [a["path"] for a in cands],
                "schema": None,
            }
            if batch_id is not None:
                rec["batch_id"] = batch_id
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
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return None


def _extract_bounds(predicate: str, col: str):
    """Conservative [lo, hi] range ``col`` must satisfy for the
    predicate to hold, or ``None`` when no sound range exists.

    Handles the data-skipping subset real engines extract: top-level
    conjunctions of ``col <op> literal`` / ``literal <op> col`` /
    ``col BETWEEN a AND b`` / ``col IN (literals)``. Any disjunction or
    negation disables pruning entirely (correctness first) — a file is
    only ever skipped when its [min,max] cannot intersect the range."""
    import re

    up = f" {predicate.upper()} "
    if " OR " in up or " NOT " in up or "NOT(" in up.replace(" ", ""):
        return None
    c = re.escape(col)
    lo: object = None
    hi: object = None

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

    lit_re = r"('[^']*'|\"[^\"]*\"|[-+]?[0-9]+(?:\.[0-9]+)?)"
    for op, tok in re.findall(rf"\b{c}\s*{_CMP_RE}\s*{lit_re}", predicate):
        tighten(op, _pred_literal(tok))
    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}
    for tok, op in re.findall(rf"{lit_re}\s*{_CMP_RE}\s*\b{c}\b", predicate):
        tighten(flip[op], _pred_literal(tok))
    m = re.search(
        rf"\b{c}\s+BETWEEN\s+{lit_re}\s+AND\s+{lit_re}",
        predicate,
        re.IGNORECASE,
    )
    if m:
        tighten(">=", _pred_literal(m.group(1)))
        tighten("<=", _pred_literal(m.group(2)))
    m = re.search(rf"\b{c}\s+IN\s*\(([^()]*)\)", predicate, re.IGNORECASE)
    if m:
        lits = [_pred_literal(t) for t in m.group(1).split(",")]
        if all(v is not None for v in lits) and lits:
            tighten(">=", min(lits))
            tighten("<=", max(lits))
    if lo is None and hi is None:
        return None
    return (lo, hi)


def delete_where(
    spark: SparkSession, root: str, predicate: str, *, prune_col: str | None = None
) -> int:
    """Delete matching rows, copy-on-write at file granularity.

    Three tiers of work avoidance, each sound:

    1. **Stats pruning (no read)** — with ``prune_col``, the predicate's
       implied [lo, hi] range on that column (see
       :func:`_extract_bounds`) is intersected with each file's
       committed [min,max]; a file that cannot overlap is carried by
       reference without being opened.
    2. **Match detection (one job)** — all surviving candidates are
       scanned in a SINGLE Spark job tagged by ``input_file_name``; a
       candidate with no matching row is also carried by reference.
       (The prior implementation issued 1–2 sequential jobs per live
       file — O(file-count) driver round-trips at 1e5-file scale.)
    3. **Rewrite (one job)** — kept rows of all matched files are
       rewritten together in one write.
    """
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    cands = live
    if prune_col:
        bounds = _extract_bounds(predicate, prune_col)
        if bounds is not None:
            lo, hi = bounds
            pruned_cands = []
            for a in live:
                st = a.get("stats", {}).get(prune_col)
                if st is None or st[0] is None:
                    pruned_cands.append(a)
                elif (hi is None or st[0] <= hi) and (lo is None or lo <= st[1]):
                    pruned_cands.append(a)
            cands = pruned_cands
    if not cands:
        return base_v
    tagged = spark.read.parquet(*_abs_paths(root, cands)).withColumn(
        "_file", F.input_file_name()
    )
    def _norm(uri: str) -> str:
        # input_file_name() yields file:///abs/path — strip scheme and
        # collapse the leading slashes for comparison.
        return "/" + uri.removeprefix("file:").lstrip("/")

    matched_files = {
        _norm(r["_file"])
        for r in tagged.filter(predicate).select("_file").distinct().collect()
    }
    if not matched_files:
        return base_v
    abs_root = os.path.abspath(root)
    removed = [
        a["path"]
        for a in cands
        if _norm(os.path.join(abs_root, a["path"])) in matched_files
    ]
    v = base_v + 1
    kept = (
        spark.read.parquet(*(os.path.join(root, p) for p in removed))
        .filter(f"NOT ({predicate})")
    )
    adds = _write_data_files(kept, root, v, meta["stat_cols"])
    _write_commit(
        root,
        v,
        {"version": v, "action": "delete", "add": adds, "remove": removed,
         "schema": None},
    )
    _maybe_checkpoint(root, v, meta.get("checkpoint_every", 10))
    return v


def compact_small(
    spark: SparkSession,
    root: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Size-tiered OPTIMIZE: rewrite ONLY the live files smaller than
    ``target_bytes // 2`` into ~``target_bytes`` outputs, carrying every
    right-sized file by reference (never read, never written). This is
    the operational companion to :func:`streaming_sink` — many
    micro-batch appends each land a small file, and full :func:`compact`
    would rewrite the whole table per invocation (O(table) churn for an
    O(new-smalls) problem). Data-identical commit (a version diff is
    empty); no-op (no commit) when fewer than ``min_files`` small files
    exist. At 100 TB: cost ∝ accumulated small bytes, not table size."""
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    small = [
        a
        for a in live
        if os.path.getsize(os.path.join(root, a["path"])) < target_bytes // 2
    ]
    if len(small) < min_files:
        return base_v
    total = sum(os.path.getsize(os.path.join(root, a["path"])) for a in small)
    n_out = max(1, round(total / target_bytes))
    df = spark.read.parquet(*_abs_paths(root, small)).coalesce(n_out)
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
    files from many appends stop taxing every scan."""
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    df = spark.read.parquet(*_abs_paths(root, live)).coalesce(target_files)
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
    column. One shuffle (the range partitioner), one write."""
    from . import layout

    if not 1 <= len(by) <= 2:
        raise ValueError("cluster by 1 column (sort) or 2 (Z-order)")
    meta = _table_meta(root)
    base_v = latest_version(root)
    live, _schema = snapshot_files(root, base_v)
    df = spark.read.parquet(*_abs_paths(root, live))
    key = (
        F.col(by[0])
        if len(by) == 1
        else layout.zorder_value(by[0], by[1])
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
    feed is deterministic and replayable from any version."""
    head = latest_version(root)
    if not 0 <= v_from < v_to <= head:
        raise ValueError(
            f"need 0 <= v_from < v_to <= head({head}), "
            f"got ({v_from}, {v_to}]"
        )
    _live, schema = snapshot_files(root, v_to)
    st = StructType.fromJson(schema)

    def _side(paths: list[str]) -> DataFrame:
        if not paths:
            return spark.createDataFrame([], st)
        return spark.read.schema(st).parquet(
            *(os.path.join(root, p) for p in paths)
        )

    out = None
    for v in range(v_from + 1, v_to + 1):
        rec = _read_commit(root, v)
        added = _side([a["path"] for a in rec.get("add", [])])
        removed = _side(rec.get("remove", []))
        d = (
            added.exceptAll(removed)
            .withColumn("_change_type", F.lit("inserted"))
            .unionByName(
                removed.exceptAll(added)
                .withColumn("_change_type", F.lit("deleted"))
            )
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )
        out = d if out is None else out.unionByName(d)
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
    deleted = []
    now = time.time()
    data_root = os.path.join(root, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for fname in files:
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, root)
            if rel in keep or not fname.endswith(".parquet"):
                continue
            if min_age_seconds > 0 and now - os.path.getmtime(full) < min_age_seconds:
                continue
            os.remove(full)
            deleted.append(rel)
    # drop now-empty version dirs
    for d in sorted(os.listdir(data_root)):
        full = os.path.join(data_root, d)
        if os.path.isdir(full) and not any(
            f.endswith(".parquet") for f in os.listdir(full)
        ):
            shutil.rmtree(full)
    return sorted(deleted)


def streaming_sink(
    root: str,
    *,
    key_col: str | None = None,
    compact_every: int = 0,
    compact_target_bytes: int = 128 * 1024 * 1024,
):
    """``foreachBatch`` function writing a stream into the table with
    exactly-once semantics: the micro-batch id is recorded in the
    commit, so a crash between sink commit and Spark's checkpoint
    advance — which makes Structured Streaming REPLAY the batch — hits
    the :func:`committed_batch_ids` ledger and becomes a no-op instead
    of a duplicate. ``key_col`` switches from append to
    :func:`merge_upsert` (streaming CDC upsert; batch must be
    key-unique — dedupe upstream, e.g. a last-per-key window).

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
            merge_upsert(batch_df, root, key_col=key_col, batch_id=batch_id)
        if compact_every > 0 and batch_id % compact_every == compact_every - 1:
            compact_small(
                batch_df.sparkSession, root, target_bytes=compact_target_bytes
            )

    return _sink
