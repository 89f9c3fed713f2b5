"""Testdata-vintage guard for the events loader.

Round 2 regression: the driver regenerated events.parquet from
TIMESTAMP(NANOS) (read as long under the legacy conf) to timestamp[us],
and a loader hard-coded for the nanos shim broke every events consumer.
This test writes the SAME logical rows in BOTH vintages and asserts
``load_events`` yields identical TIMESTAMP_NTZ wall-clock values for
each, so a future regeneration in either direction fails here first.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
    load_events,
)

WALL_CLOCKS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 15, 12, 34, 56, 789000),
    datetime.datetime(2024, 3, 31, 23, 59, 59, 999999),
]


def _write_events(dir_path, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "ts": ts_array,
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    path = str(dir_path / "events.parquet")
    pq.write_table(table, path)
    return str(dir_path)


@pytest.fixture(scope="module")
def vintage_dirs(tmp_path_factory):
    nanos_dir = tmp_path_factory.mktemp("events_nanos")
    micros_dir = tmp_path_factory.mktemp("events_micros")
    _write_events(nanos_dir, pa.array(WALL_CLOCKS, pa.timestamp("ns")))
    _write_events(micros_dir, pa.array(WALL_CLOCKS, pa.timestamp("us")))
    return {"nanos": str(nanos_dir), "micros": str(micros_dir)}


def _rows(spark, sf_dir):
    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    return sorted(
        (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
    )


def test_both_vintages_yield_identical_ntz_wall_clock(spark, vintage_dirs):
    nanos_rows = _rows(spark, vintage_dirs["nanos"])
    micros_rows = _rows(spark, vintage_dirs["micros"])
    assert nanos_rows == micros_rows
    assert [ts for _, ts in micros_rows] == WALL_CLOCKS


def test_current_testdata_loads(spark):
    df = load_events(spark, "/root/testdata/sf0.001")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    row = df.selectExpr(
        "min(ts) as lo", "max(ts) as hi", "count(*) as n"
    ).first()
    assert row.n > 0
    assert row.lo.year >= 2000 and row.hi.year <= 2100
