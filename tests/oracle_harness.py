"""Local twin of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side and compares
row count, column names, and order-insensitive values — the same
contract CORRECTNESS_r{N}.json grades, so failures show up here first.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.schemas import (
    TABLE_NAMES,
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and integral floats
        if v == 0:
            return 0.0
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def _numeric_kinds(rows: list[tuple], cols: list[str]) -> dict[str, str]:
    """Per-column python-type kind ('decimal' | 'float' | 'int') of the
    first non-null cell. The driver's hasher does NOT coerce across
    python numeric types (r4's `mixture_token_budget` proved
    Decimal-vs-float; r5's `snapshot_diff_customer` /
    `skew_audit_orders_custkey` proved Decimal-vs-int: DuckDB
    sum(BIGINT) is HUGEINT = decimal128 at the driver's Arrow fetch),
    so ANY numeric-kind divergence is a driver hash-mismatch even when
    the values are numerically equal."""
    import decimal

    kinds: dict[str, str] = {}
    for i, c in enumerate(cols):
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, decimal.Decimal):
                kinds[c] = "decimal"
            elif isinstance(v, bool):
                pass
            elif isinstance(v, float):
                kinds[c] = "float"
            elif isinstance(v, int):
                kinds[c] = "int"
            break
    return kinds


def decimal_float_mismatches(
    s_rows: list[tuple], s_cols: list[str], d_rows: list[tuple], d_cols: list[str]
) -> list[str]:
    """Columns whose numeric kind (int / float / Decimal) differs
    between the engines — each is a driver hash mismatch."""
    sk = _numeric_kinds(s_rows, s_cols)
    dk = _numeric_kinds(d_rows, d_cols)
    return sorted(c for c in set(sk) & set(dk) if sk[c] != dk[c])


def compare(spark, query_fn, sql: str, sf_dir: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    # Fetch through Arrow, exactly like the driver: DuckDB HUGEINT
    # (any bare integer sum) surfaces as decimal128(38,0)/Decimal here,
    # where .fetchall() would hand back a plain Python int and hide the
    # divergence the driver's hasher sees (the r5 red rows).
    tbl = con.execute(sql).fetch_arrow_table()
    d_cols = list(tbl.schema.names)
    d_rows = [tuple(d.values()) for d in tbl.to_pylist()]
    con.close()

    result = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "value_match": False,
    }
    if result["count_match"] and result["schema_match"]:
        ns, nd = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
        result["value_match"] = ns == nd
        if not result["value_match"]:
            diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
            result["first_diffs"] = diffs[:3]
        # Decimal-vs-float type divergence fails the driver's hasher
        # even when coerced values agree — flag it, don't hide it.
        dfm = decimal_float_mismatches(s_rows, s_cols, d_rows, d_cols)
        if dfm:
            result["decimal_float_mismatch"] = dfm
            result["value_match"] = False
    return result
