"""Structured Streaming over the ``events`` table (SURVEY §2.13).

The reference has no streaming surface; the ``events`` fixture is the
forward-looking hook. Everything here is the idiomatic Spark shape for a
production event stream:

- file-source stream (``readStream`` + explicit schema; in production the
  same code points at Kafka by swapping the reader),
- event-time watermark for late data,
- tumbling-window aggregation (``window(ts, '1 day')``),
- session windows (``session_window(ts, '30 minutes')``),
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-user counters) — the extension point for operators Spark lacks.

Each streaming aggregation has a batch twin over the identical input so
tests (and the oracle gate, via the batch ``sessionize_events`` registry
query) can verify stream results exactly: with an ``availableNow`` trigger
the stream must produce the same rows as the batch plan.

Scale notes: windowed/sessionized state is partitioned by the grouping key
(event_type / user_id) across executors; the watermark bounds state size —
without it a 100 TB stream accumulates state forever. File source splits
by file; ``maxFilesPerTrigger`` bounds micro-batch size for backfill.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_tables
from ..functions.numeric import dsum_sql

SESSION_GAP = "30 minutes"
WATERMARK = "1 day"

# events.parquet carries timestamp[ns]; Spark's reader needs nanosAsLong
# (catalog handles batch; the stream schema declares ts as LONG and the
# plan converts ns → µs, identical to catalog._read_table).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per
    micro-batch so backfills replay incrementally)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        # file source wants a directory; the glob selects the event files
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin: identical rows via the catalog reader."""
    return load_tables(spark, sf_dir)["events"]


def tumbling_daily_agg(events: DataFrame) -> DataFrame:
    """Watermarked tumbling 1-day window per event_type: count + sum(value).
    Works unchanged on a stream or a batch frame (same Catalyst operator)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", WATERMARK)
    return (
        df.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum: associative, so micro-batch state merges
            # produce bit-identical totals to the batch twin
            F.expr(dsum_sql("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame) -> DataFrame:
    """Session windows per user (gap-based merge, 30 min): start / end /
    event count / value sum. ``session_window`` is the built-in stateful
    merge operator — batch and streaming share the plan."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", WATERMARK)
    return (
        df.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum_sql("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --- custom stateful operator: running per-user counters ---------------------

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_counter(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """``applyInPandasWithState``: running (count, sum) per user, updated
    every micro-batch — the template for custom operators Spark lacks
    (per-key model state, CEP, incremental sketches). State lives in the
    state store partitioned by user_id; Arrow moves batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_counter,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming frame into an in-memory table with availableNow
    (test/backfill harness; production would writeStream to Delta/Kafka)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
