"""Arrow-level oracle type-portability sweep.

The driver fetches DuckDB oracle results through Arrow (or pandas):
DuckDB HUGEINT (the result of sum(BIGINT), or any arithmetic touching
one) arrives as decimal128(38,0) — while the Spark twin emits LONG.
The driver's value hasher does not coerce across python types, so a
kind divergence is a guaranteed red row even when values are equal
(CORRECTNESS_r05: mixture_token_budget / snapshot_diff_customer /
skew_audit_orders_custkey — all bare integer sums in the oracle).

This sweep runs EVERY registered oracle at sf0.001 through
fetch_arrow_table() and compares each column's Arrow type kind against
the Spark query's schema kind. Exit non-zero on any divergence.

It also reports (a) column-name divergences — a column present on only
one side is a guaranteed driver red on its own — and (b) IEEE negative
zero in any float column of the DuckDB result: Spark and DuckDB render
-0.0 differently ('0.0' vs '-0.0'), so any oracle that can emit -0.0
is at value-hash risk and should normalize with `+ 0.0` (see
docs/QUERIES.md signed-zero convention).

Run from anywhere: PYTHONPATH must include /root/repo.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

from pyspark.sql import types as T


def arrow_kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_kind(t.value_type)}>"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def spark_kind(t: T.DataType) -> str:
    if isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(t, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.ArrayType):
        return f"list<{spark_kind(t.elementType)}>"
    if isinstance(t, T.BinaryType):
        return "binary"
    return t.simpleString()


def compatible(s: str, d: str) -> bool:
    if s == d:
        return True
    # both decimal with identical (p,s) already equal; different (p,s)
    # renders differently ('5.00' vs '5') -> incompatible.
    return False


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
        get_spark,
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.schemas import (
        TABLE_NAMES,
    )
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = sys.argv[1:]
    keys = [k for k in queries if k in oracles and (not only or k in only)]

    spark = get_spark(app_name="oracle-type-sweep")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )

    bad: dict[str, list] = {}
    name_bad: dict[str, dict] = {}
    negzero: dict[str, list] = {}
    errs: dict[str, str] = {}
    for i, k in enumerate(keys):
        try:
            sdf = queries[k](spark, sf_dir)
            skinds = {f.name: spark_kind(f.dataType) for f in sdf.schema.fields}
            tbl = con.execute(oracles[k]).fetch_arrow_table()
            dkinds = {
                f.name: arrow_kind(f.type) for f in tbl.schema
            }
            only_spark = sorted(set(skinds) - set(dkinds))
            only_duck = sorted(set(dkinds) - set(skinds))
            if only_spark or only_duck:
                name_bad[k] = {"spark_only": only_spark,
                               "duckdb_only": only_duck}
            diffs = [
                {"col": c, "spark": skinds[c], "duckdb": dkinds[c]}
                for c in skinds
                if c in dkinds and not compatible(skinds[c], dkinds[c])
            ]
            if diffs:
                bad[k] = diffs
            nz_cols = []
            for f in tbl.schema:
                if not pa.types.is_floating(f.type):
                    continue
                import numpy as np

                for chunk in tbl.column(f.name).chunks:
                    vals = np.asarray(
                        chunk.to_numpy(zero_copy_only=False), dtype="float64"
                    )
                    # -0.0 == 0.0 but copysign distinguishes them
                    mask = (vals == 0.0) & (np.copysign(1.0, vals) < 0)
                    if bool(mask.any()):
                        nz_cols.append(f.name)
                        break
            if nz_cols:
                negzero[k] = nz_cols
        except Exception as e:  # noqa: BLE001
            errs[k] = f"{type(e).__name__}: {e}"[:300]
        if (i + 1) % 25 == 0:
            print(f"  …{i + 1}/{len(keys)}", file=sys.stderr)

    print(json.dumps({"checked": len(keys), "divergent": bad,
                      "name_divergent": name_bad, "negative_zero": negzero,
                      "errors": errs},
                     indent=1, sort_keys=True))
    spark.stop()
    return 1 if (bad or name_bad or negzero or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
