"""Structured Streaming tests: with an availableNow trigger, every
streaming aggregation must produce EXACTLY the rows of its batch twin
(decimal sums make the totals bit-identical)."""

from __future__ import annotations

import pytest

from intellect_bi_spark.streaming import events as se

from .parity import normalized_rows


def _drain(spark, df, name, mode="complete"):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    se.run_stream_to_memory(df, name, output_mode=mode)
    return spark.table(name)


def _same_rows(a, b):
    ra = normalized_rows(list(a.columns), [tuple(r) for r in a.collect()])
    rb = normalized_rows(list(b.columns), [tuple(r) for r in b.collect()])
    assert sorted(a.columns) == sorted(b.columns)
    assert ra == rb


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    got = _drain(spark, se.tumbling_daily_agg(stream), "t_tumble")
    want = se.tumbling_daily_agg(se.events_batch(spark, sf_dir))
    _same_rows(got, want)


def test_stream_sessions_equal_batch(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(spark, se.session_agg(stream), "t_sessions")
    want = se.session_agg(se.events_batch(spark, sf_dir))
    _same_rows(got, want)


def test_stream_sliding_equals_batch(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(spark, se.sliding_daily_agg(stream), "t_sliding")
    want = se.sliding_daily_agg(se.events_batch(spark, sf_dir))
    _same_rows(got, want)


def test_stream_dedup_replay_equals_batch(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(spark, se.dedup_replayed_events(stream), "t_dedup")
    want = se.dedup_replayed_events(se.events_batch(spark, sf_dir))
    _same_rows(got, want)


def test_stateful_running_totals(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(
        spark, se.running_user_totals(stream), "t_running", mode="update"
    )
    # update mode emits one row per user per micro-batch; the LAST row per
    # user is the running total after all data — compare against batch agg
    from pyspark.sql import functions as F

    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    want = (
        se.events_batch(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    f = {r["user_id"]: r for r in final.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(f) == set(w)
    for uid, row in w.items():
        assert f[uid]["n_events"] == row["n_events"]
        assert f[uid]["total_value"] == pytest.approx(row["total_value"], abs=1e-6)


def test_stream_parquet_sink_checkpointed(spark, sf_dir, tmp_path):
    """writeStream → parquet files with a checkpoint (exactly-once file
    sink): output rows equal the batch aggregation, and a restart with the
    same checkpoint emits nothing new (no duplicates)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            se.tumbling_daily_agg(se.read_events_stream(spark, sf_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    back = spark.read.parquet(out)
    want = se.tumbling_daily_agg(se.events_batch(spark, sf_dir))
    # append mode + watermark: only windows closed by the final watermark
    # are emitted; every emitted row must match its batch twin, and the
    # only missing rows are the last (still-open) day per event_type.
    got_rows = {tuple(r) for r in back.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    missing = want_rows - got_rows
    import datetime

    max_day = max(r[0] for r in want_rows)
    horizon = max_day - datetime.timedelta(days=2)
    assert all(r[0] >= horizon for r in missing), missing
    # idempotent restart with the same checkpoint: nothing new appears
    n_before = back.count()
    run()
    assert spark.read.parquet(out).count() == n_before


def test_foreachbatch_daily_store_equals_batch(spark, sf_dir, tmp_path):
    """The foreachBatch-merged serving store must equal the batch daily
    aggregate exactly, and re-running against the same checkpoint must
    leave the store unchanged (idempotent restart)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "daily_store")
    ckpt = str(tmp_path / "ckpt_store")

    q = se.stream_daily_store(spark, sf_dir, out, ckpt)
    q.awaitTermination(120)

    want = {
        (r["day_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in se.tumbling_daily_agg(
            se.events_batch(spark, sf_dir)
        ).collect()
    }
    got_rows = (
        spark.read.parquet(out)
        .select(
            F.col("day_start"), "event_type", "n_events", "total_value"
        )
        .collect()
    )
    got = {
        (r["day_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got_rows
    }
    assert got == want and len(got_rows) == len(want)

    # restart with the same checkpoint: no new data, store unchanged
    q2 = se.stream_daily_store(spark, sf_dir, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(want)


def test_transform_with_state_running_totals(spark, sf_dir):
    """The modern transformWithStateInPandas processor must reach the same
    final per-user totals as both the legacy applyInPandasWithState
    operator and the plain batch aggregate. Skips where the TWS state-API
    client's protobuf dependency is absent (this container)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(
        spark, se.running_user_totals_tws(stream), "t_tws", mode="update"
    )
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    want = (
        se.events_batch(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    f = {r["user_id"]: r for r in final.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(f) == set(w)
    for uid, row in w.items():
        assert f[uid]["n_events"] == row["n_events"]
        assert f[uid]["total_value"] == pytest.approx(
            row["total_value"], abs=1e-6
        )


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """The stream-stream interval self-join (click→purchase attribution)
    must emit exactly the batch twin's pairs: same (purchase_id,
    click_id) set, drained with availableNow in append mode (the only
    output mode stream-stream joins support). The watermark + interval
    bound is what lets Spark expire join state — this test locks the
    operator end to end, not just the batch plan."""
    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(
        spark,
        se.click_purchase_pairs(stream).select("purchase_id", "click_id"),
        "t_cpjoin",
        mode="append",
    )
    want = (
        se.click_purchase_pairs(se.events_batch(spark, sf_dir))
        .select("purchase_id", "click_id")
    )
    got_pairs = {(r["purchase_id"], r["click_id"]) for r in got.collect()}
    want_pairs = {(r["purchase_id"], r["click_id"]) for r in want.collect()}
    assert got_pairs == want_pairs and len(want_pairs) > 0


def test_stream_static_tier_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment join (r8): the streaming run — static
    tier dimension broadcast into each micro-batch, watermarked daily
    aggregate downstream — must produce exactly the batch twin's rows."""
    stream = se.read_events_stream(spark, sf_dir)
    tiers = se.user_tier_dim(spark, sf_dir)
    assert not tiers.isStreaming
    got = _drain(spark, se.tier_daily_agg(stream, tiers), "t_tierjoin")
    want = se.tier_daily_agg(se.events_batch(spark, sf_dir), tiers)
    _same_rows(got, want)


def test_stateful_click_streaks_stream_equals_batch(spark, sf_dir):
    """The order-dependent streak CEP operator: the streaming
    applyInPandasWithState run must land on exactly the batch twin's
    per-user (n_clicks, longest_streak, n_streaks). All three output
    columns are per-user monotone nondecreasing across micro-batches, so
    the final state per user is the per-column MAX of the update-mode
    emissions."""
    from pyspark.sql import functions as F

    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(
        spark, se.user_click_streaks_stream(stream), "t_streaks",
        mode="update",
    )
    final = got.groupBy("user_id").agg(
        F.max("n_clicks").alias("n_clicks"),
        F.max("longest_streak").alias("longest_streak"),
        F.max("n_streaks").alias("n_streaks"),
    )
    want = se.user_click_streaks_batch(se.events_batch(spark, sf_dir))
    _same_rows(final, want)
    assert want.filter("longest_streak >= 2").count() > 0


def test_stateful_click_streaks_chain_across_batches(spark, tmp_path):
    """A streak SPANNING the micro-batch boundary must chain through the
    stored trailing-run state: user 1's four consecutive clicks are split
    2+2 across two time-ordered files (maxFilesPerTrigger=1 makes each
    its own micro-batch; distinct mod-times pin oldest-first order), and
    the final longest_streak must be 4 counted as ONE streak — which no
    commutative streaming aggregate could produce."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "streak_src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00", tz="UTC")

    def _rows(spec, start_eid):
        return pd.DataFrame(
            {
                "event_id": range(start_eid, start_eid + len(spec)),
                "ts": [t0 + pd.Timedelta(minutes=m) for m, _ in spec],
                "user_id": [1] * len(spec),
                "event_type": [t for _, t in spec],
                "value": [1.0] * len(spec),
                "props": ["{}"] * len(spec),
            }
        )

    # batch 1 ends mid-streak (two clicks open); batch 2 opens with two
    # more clicks, then a view breaks the run, then an isolated click
    # µs-coerced tz-aware timestamps → parquet TIMESTAMP(MICROS, UTC),
    # which Spark's `ts timestamp` schema reads directly (pandas' default
    # ns INT64 is rejected by the streaming scan)
    _rows([(0, "view"), (1, "click"), (2, "click")], 10).to_parquet(
        src / "events.parquet", coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    b2 = src / "later"
    b2.mkdir()
    _rows([(3, "click"), (4, "click"), (5, "view"), (6, "click")], 20
          ).to_parquet(b2 / "events.parquet", coerce_timestamps="us",
                       allow_truncated_timestamps=True)
    now = time.time()
    os.utime(src / "events.parquet", (now - 100, now - 100))
    os.utime(b2 / "events.parquet", (now, now))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    got = _drain(
        spark, se.user_click_streaks_stream(stream), "t_streak_chain",
        mode="update",
    )
    rows = {
        (r["user_id"], r["n_clicks"]): r
        for r in got.collect()
    }
    # after batch 1: 2 clicks, one open streak of 2
    assert rows[(1, 2)]["longest_streak"] == 2
    assert rows[(1, 2)]["n_streaks"] == 1
    # after batch 2: the boundary-spanning streak is 2+2=4, ONE streak;
    # the trailing isolated click is the second
    assert rows[(1, 5)]["longest_streak"] == 4
    assert rows[(1, 5)]["n_streaks"] == 2


def test_stream_stream_outer_join_matches_batch_on_closed_region(
    spark, sf_dir
):
    """The LEFT OUTER stream-stream interval join: matched pairs must be
    EXACTLY the batch twin's (inner results don't wait on watermarks);
    NULL-click (organic) purchases must (a) all be organic in the batch
    twin — no false organics ever — and (b) be COMPLETE on the
    watermark-closed region, i.e. every batch-organic purchase older
    than max_ts − watermark − window is emitted.  Purchases inside the
    final horizon are legitimately withheld (no watermark can prove
    their window closed) — the documented outer-join semantics this
    test pins down."""
    import datetime

    from pyspark.sql import functions as F

    stream = se.read_events_stream(spark, sf_dir)
    got = _drain(
        spark,
        se.click_purchase_pairs_outer(stream).select(
            "purchase_id", "click_id"
        ),
        "t_cpojoin",
        mode="append",
    )
    batch = se.click_purchase_pairs_outer(se.events_batch(spark, sf_dir))
    # Collect each side ONCE (ADVICE r8): a second .collect() re-executes
    # the streaming drain readback / the full batch outer join.
    got_rows = got.collect()
    batch_all = batch.collect()
    got_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in got_rows
        if r["click_id"] is not None
    }
    want_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in batch_all
        if r["click_id"] is not None
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0

    got_organics = {
        r["purchase_id"] for r in got_rows if r["click_id"] is None
    }
    batch_organics = {
        r["purchase_id"]
        for r in batch_all
        if r["click_id"] is None
    }
    # (a) no false organics
    assert got_organics <= batch_organics
    # (b) complete on the closed region: watermark delay (1 day) +
    # attribution window (1 hour) + 1 minute slack behind max event time
    max_ts = se.events_batch(spark, sf_dir).agg(
        F.max("ts").alias("m")
    ).collect()[0]["m"]
    horizon = max_ts - datetime.timedelta(days=1, hours=1, minutes=1)
    ts_of = {r["purchase_id"]: r["purchase_ts"] for r in batch_all}
    closed_organics = {
        pid for pid in batch_organics if ts_of[pid] <= horizon
    }
    assert closed_organics and closed_organics <= got_organics
