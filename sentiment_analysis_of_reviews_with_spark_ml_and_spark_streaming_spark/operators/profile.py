"""Single-pass column profiling — the dataset-card / data-quality
summary a lake pipeline runs on every ingested table.

One aggregation computes every column's stats simultaneously (one
scan, one reduce — never a per-column pass), then the wide row is
unpivoted to one row per column. Numeric min/max surface as doubles,
string min/max as strings — keeping each measure in its native type
family so the output is engine-portable (no float→text formatting
dependence)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, num_min, num_max,
    str_min, str_max) per profiled column.

    n_distinct is exact (count(distinct)); at 100 TB swap for
    approx_count_distinct — same single-pass shape, the aggregate
    buffers just become HLL sketches."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = dtypes[c].split("(")[0] in _NUMERIC
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if is_num:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__mx_{c}"))
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        is_num = dtypes[c].split("(")[0] in _NUMERIC
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "num_min"
                ),
                (F.col(f"__mx_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "num_max"
                ),
                (F.lit(None).cast("string") if is_num else F.col(f"__mn_{c}")).alias(
                    "str_min"
                ),
                (F.lit(None).cast("string") if is_num else F.col(f"__mx_{c}")).alias(
                    "str_max"
                ),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
