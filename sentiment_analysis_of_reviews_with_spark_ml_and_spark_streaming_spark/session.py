"""SparkSession factory tuned for this engine.

Reference builds bare ``SparkContext('local[*]')`` sessions with zero
tuning (Yelp_Data_PreProcessing.py:41-42, Prediction_Pipe_Line.py:95).
We centralize one builder with the settings that matter at scale:

- AQE (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast) — the single biggest lever for 100 TB joins/aggs.
- Arrow for any driver hand-off (``toPandas``; the reference collected
  an entire corpus un-Arrow'd, SURVEY.md §4.2 item 1).
- shuffle partitions sized to the local core count instead of the 200
  default; on a real cluster this is overridden per-job or left to AQE
  coalescing from a high initial value.
- UTC session timezone so timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sentiment_reviews_spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
