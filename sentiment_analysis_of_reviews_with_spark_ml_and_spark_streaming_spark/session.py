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


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    driver's cwd/PYTHONPATH.

    cloudpickle serializes module-level functions (mapInPandas /
    applyInPandas batch fns) BY REFERENCE — workers must re-import the
    module. An external driver that imports `__spark_entry__` via
    sys.path manipulation from some other cwd gives its workers no way
    to do that, so the engine self-registers: zip the package once per
    SparkContext and ``addPyFile`` it (shipped via SparkFiles, prepended
    to worker sys.path at task deserialization). Idempotent, ~ms cost,
    pure-JVM queries never notice.
    """
    sc = spark.sparkContext
    if getattr(sc, "_spark_graft_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"spark_graft_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    arc = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, arc)
    sc.addPyFile(zpath)
    sc._spark_graft_pyfiles_added = True


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
