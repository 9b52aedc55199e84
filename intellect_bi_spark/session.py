"""SparkSession factory for the intellect-bi Spark engine.

The reference keeps one lazy global DuckDB connection per process
(reference api/main.py:160,190 ``_ensure_duckdb``); the Spark analogue is a
singleton SparkSession with scale-oriented defaults:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast) so the
  same declarative plans survive a 1000-executor / 100 TB deployment.
- ``spark.sql.shuffle.partitions`` sized for the local harness; on a real
  cluster AQE coalesces from a high initial number, so we set the initial
  partition count rather than hand-tuning per query.
- Session timezone pinned to UTC so timestamp→date casts agree with the
  DuckDB oracle (naive timestamps).
- Arrow enabled for the Pandas-UDF slow path (forecasting, embedding).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "intellect_bi_spark") -> SparkSession:
    """Return the singleton SparkSession, creating it with engine defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # grouped_exact's overflow contract ("a pathological stage-1 BIGINT
        # partial throws, never wraps", functions/numeric.py) relies on ANSI
        # arithmetic. Spark 4 defaults it on, but a caller-built session may
        # not — pin it so the contract is independent of who built the session
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", DEFAULT_CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver hands us its own SparkSession; these confs are all
    runtime-mutable so correctness-critical settings (timezone) and
    performance settings (AQE) apply regardless of who built the session.
    """
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark
