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

# Streaming file sources need an explicit schema; its ``ts`` declaration
# must match the file's physical type. The fixtures have shipped both
# timestamp[ns] (needs nanosAsLong LONG + in-plan ns→µs, like
# catalog._read_table) and naive timestamp[us] (reads directly as
# TIMESTAMP_NTZ), so the reader inspects the footer and branches.


def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per
    micro-batch so backfills replay incrementally)."""
    from ..catalog import _nanos_columns, enable_nanos_as_long
    import os

    ns = "ts" in _nanos_columns(os.path.join(sf_dir, "events.parquet"))
    ts_type = T.LongType() if ns else T.TimestampNTZType()
    if ns:
        enable_nanos_as_long(spark)  # session-global; single documented owner
    raw = (
        spark.readStream.schema(_events_stream_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        # file source wants a directory; the glob selects the event files
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ns:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Watermarks require TIMESTAMP (LTZ) event time — NTZ is rejected
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). With the session timezone
    # pinned to UTC the cast is value-exact; no-op when already LTZ.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin: identical rows via the catalog reader (ts cast to
    LTZ to match the stream reader — see read_events_stream)."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


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


def sliding_daily_agg(events: DataFrame) -> DataFrame:
    """Sliding windows: 1-day width, 12-hour slide, per event_type — each
    event contributes to exactly two overlapping windows. The canonical
    trailing-metrics shape ("last 24 h, refreshed every 12 h"); state per
    (window, event_type) is bounded by the watermark on streams."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", WATERMARK)
    return (
        df.groupBy(
            F.window("ts", "1 day", "12 hours").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum_sql("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_replayed_events(events: DataFrame) -> DataFrame:
    """At-least-once delivery dedup: every event arrives twice (replay
    modeled in-plan by exploding two copies) and must be counted once.

    Streaming: ``dropDuplicatesWithinWatermark`` keyed on event_id — the
    idiomatic replay filter; state holds one key per event inside the
    watermark horizon and is evicted beyond it, so state size is bounded
    by event-rate × watermark, not stream lifetime. Batch twin:
    ``dropDuplicates`` on the same key. Output: per-type totals over the
    deduplicated rows, which must equal the totals over the original
    (never-duplicated) input."""
    replayed = events.withColumn(
        "replay", F.explode(F.array(F.lit(0), F.lit(1)))
    ).drop("replay")
    if replayed.isStreaming:
        deduped = replayed.withWatermark("ts", WATERMARK)
        deduped = deduped.dropDuplicatesWithinWatermark(["event_id"])
    else:
        deduped = replayed.dropDuplicates(["event_id"])
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum_sql("value")).alias("total_value"),
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


# --- custom ORDER-DEPENDENT stateful operator: click-streak CEP ---------------
#
# running_user_totals above is a commutative fold (count/sum) — Spark's
# built-in streaming aggregate could express it. The streak tracker is the
# operator class that genuinely NEEDS applyInPandasWithState: "longest run
# of consecutive 'click' events per user" is order-dependent and
# non-commutative, the textbook complex-event-processing shape (built-in
# streaming aggs only merge commutative partial states). State carries the
# run length still OPEN at the end of the processed prefix ("trailing") so
# a streak that spans a micro-batch boundary chains exactly; micro-batches
# must arrive in event-time order per key (the file source's oldest-first
# mod-time order — tests/test_streaming.py proves a boundary-spanning
# streak chains across two time-split files).
#
# Scale: state is 4 BIGINTs per user in the state store (partitioned by
# user_id across executors); each micro-batch moves one Arrow batch per
# active user and the run-length scan is vectorized numpy — no per-row
# Python in the hot path.

STREAK_TYPE = "click"

_STREAK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("best", T.LongType()),
        T.StructField("n_streaks", T.LongType()),
        T.StructField("n_clicks", T.LongType()),
        T.StructField("trailing", T.LongType()),
    ]
)
_STREAK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_clicks", T.LongType()),
        T.StructField("longest_streak", T.LongType()),
        T.StructField("n_streaks", T.LongType()),
    ]
)


def _streak_tracker(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    best, n_streaks, n_clicks, trailing = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # event-time order within the batch (event_id tiebreak — matches the
    # batch twin's window ORDER BY exactly)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    a = (pdf["event_type"] == STREAK_TYPE).to_numpy().astype(np.int8)
    if len(a):
        n_clicks += int(a.sum())
        # vectorized run-length encoding of the click runs
        edges = np.flatnonzero(np.diff(np.concatenate(([0], a, [0]))))
        runs = edges.reshape(-1, 2)
        lengths = (runs[:, 1] - runs[:, 0]).astype(np.int64)
        if len(lengths):
            # a click run starting at row 0 continues the streak left open
            # by the previous micro-batch: extend it, don't re-count it
            chained = bool(a[0]) and trailing > 0
            eff = lengths.copy()
            if chained:
                eff[0] += trailing
            n_streaks += len(lengths) - (1 if chained else 0)
            best = max(best, int(eff.max()))
            trailing = int(eff[-1]) if a[-1] else 0
        else:
            trailing = 0
    state.update((best, n_streaks, n_clicks, trailing))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_clicks": [n_clicks],
            "longest_streak": [best],
            "n_streaks": [n_streaks],
        }
    )


def user_click_streaks_stream(events: DataFrame) -> DataFrame:
    """Streaming longest-click-streak per user via
    ``applyInPandasWithState`` (requires a streaming frame)."""
    return (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _streak_tracker,
            outputStructType=_STREAK_OUT_SCHEMA,
            stateStructType=_STREAK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_click_streaks_batch(events: DataFrame) -> DataFrame:
    """Batch twin: gaps-and-islands over ONE window spec (user_id,
    ordered by ts/event_id) — the lag-mark and the running group counter
    share the sort, so the plan is a single shuffle + sort + WindowExec,
    then a hash aggregate. Users with events but zero clicks keep a row
    (all-zero streak columns) so the output covers every active user."""
    from pyspark.sql import Window

    e = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == STREAK_TYPE).alias("is_click"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "is_click",
        F.sum(
            F.when(
                F.col("is_click")
                & ~F.coalesce(F.lag("is_click").over(w), F.lit(False)),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    streaks = (
        marked.filter("is_click")
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    per_user = streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_clicks"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    active = e.select("user_id").distinct()
    return (
        active.join(per_user, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("longest_streak", F.lit(0)).alias("longest_streak"),
            F.coalesce("n_streaks", F.lit(0)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


# --- transformWithState: the modern arbitrary-stateful-processing API --------


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` running (count, sum) per user — the
    modern custom-stateful-operator surface (§2.13 / §2.12), successor to
    ``applyInPandasWithState`` (typed state handles, timers, TTL, state
    schema evolution). Semantics identical to
    :func:`running_user_totals`; the unit test pins both to the batch
    aggregate. Requires the RocksDB state-store provider (bundled with
    Spark 4) — set on the session here — AND the ``protobuf`` package
    (the TWS state-API client speaks protobuf to the JVM;
    ``google.protobuf`` is absent in this container, so the test
    importorskips — the certified stateful path here remains
    :func:`running_user_totals`). The processor class is defined locally
    so (a) the module imports on Spark builds without the API and
    (b) cloudpickle ships it by value to the TWS driver worker."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _RunningTotalsTWS(StatefulProcessor):
        def init(self, handle) -> None:  # StatefulProcessorHandle
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsTWS(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


ATTRIBUTION_WINDOW = "1 hour"


def _click_purchase_sides(
    events: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The two watermarked sides of the attribution self-join (shared by
    the inner and left-outer variants — byte-identical construction)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", WATERMARK)
        purchases = purchases.withWatermark("purchase_ts", WATERMARK)
    return clicks, purchases


_ATTR_JOIN_COND = (
    "c_user_id = p_user_id"
    f" AND click_ts >= purchase_ts - INTERVAL {ATTRIBUTION_WINDOW}"
    " AND click_ts <= purchase_ts"
)


def click_purchase_pairs(events: DataFrame) -> DataFrame:
    """Stream-stream INTERVAL JOIN (§2.13): attribute each purchase to the
    same user's clicks in the preceding :data:`ATTRIBUTION_WINDOW` — the
    canonical conversion-attribution shape. Works unchanged on a stream
    pair or a batch frame:

    - streaming: both sides carry watermarks and the join condition
      time-bounds click_ts relative to purchase_ts, which is exactly what
      lets Spark EXPIRE join state (an unbounded stream-stream join would
      buffer both streams forever at 100 TB);
    - batch: the same plan is an equi-join on user_id with the interval
      as a residual range predicate.

    Both sides derive from ONE events source by filtering event_type —
    a stream-stream self-join, which Structured Streaming supports."""
    clicks, purchases = _click_purchase_sides(events)
    return purchases.join(clicks, F.expr(_ATTR_JOIN_COND), "inner")


def click_purchase_pairs_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join (§2.13 extension): every
    purchase, paired with its in-window clicks where they exist and with
    NULL click columns where none landed — organic-conversion detection,
    the shape the inner join cannot express.

    Streaming semantics: an unmatched purchase is emitted exactly once,
    AFTER the watermark proves no future click can still fall inside its
    interval — that's why outer stream-stream joins REQUIRE both the
    watermarks and the time-bound condition (state for both sides stays
    expirable exactly as in the inner form).  Consequence: with a finite
    availableNow drain, unmatched purchases inside the final
    watermark+window horizon are withheld (no watermark can retire
    them); tests/test_streaming.py locks stream≡batch identity on the
    closed region and the batch twin below reports full-corpus
    semantics."""
    clicks, purchases = _click_purchase_sides(events)
    return purchases.join(clicks, F.expr(_ATTR_JOIN_COND), "left_outer")


# --- stream-static enrichment join (r8) --------------------------------------
#
# The remaining §2.13 shape: a STREAM joined against a STATIC dimension
# (the user→tier lookup every real-time personalization / billing
# pipeline runs). Spark re-evaluates the static side per micro-batch and
# broadcasts it into each; no state is kept for the join itself — only
# the downstream windowed aggregate holds (watermark-bounded) state.
# The tier dimension is derived deterministically (md5-bucketed user_id)
# so the DuckDB oracle can restate dimension + join + aggregate exactly.

N_TIERS = 3


def user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static enrichment dimension: one deterministic tier per
    distinct user (a BATCH frame even when the fact side streams)."""
    from ..functions.text import md5_mod_hash_sql

    bucket = md5_mod_hash_sql("CONCAT('tier:', CAST(user_id AS STRING))")
    return (
        events_batch(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .withColumn(
            "tier",
            F.expr(
                f"CONCAT('T', CAST({bucket} % {N_TIERS} AS STRING))"
            ),
        )
    )


def tier_daily_agg(events: DataFrame, tiers: DataFrame) -> DataFrame:
    """Stream-static enrichment join + watermarked tumbling daily
    aggregate per tier — identical plan on a stream or a batch frame
    (the static side is broadcast either way)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", WATERMARK)
    return (
        df.join(F.broadcast(tiers), "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum_sql("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "tier",
            "n_events",
            "total_value",
        )
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


# --- foreachBatch incremental store (stream → serving table merge) -----------


def stream_daily_store(spark: SparkSession, sf_dir: str, out_path: str,
                       checkpoint: str):
    """``foreachBatch`` incremental MERGE into a partitioned parquet
    serving store — the production shape for maintaining a queryable
    table from a stream when the warehouse format is plain parquet (a
    Delta/Iceberg MERGE is the drop-in upgrade; this is the streaming
    twin of ``sources/sinks.upsert_embeddings``' copy-on-write merge).

    Each micro-batch's UPDATED daily aggregates overwrite exactly their
    ``day=/event_type=`` partitions (dynamic partition overwrite). The
    partition key matches the aggregation key, so a batch that updates
    only one (day, type) group replaces only that directory — and because
    every emitted row carries the group's complete current aggregate,
    REPLAYING a micro-batch writes identical bytes: the at-least-once
    ``foreachBatch`` contract yields an exactly-once STORE. Update output
    mode + watermark keep the streaming state bounded; the store, not the
    state, is the history."""
    agg = tumbling_daily_agg(read_events_stream(spark, sf_dir))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("day", F.col("day_start").cast("date"))
            .write.mode("overwrite")
            .partitionBy("day", "event_type")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_path)
        )

    return (
        agg.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
