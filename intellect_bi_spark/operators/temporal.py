"""Temporal join operators: as-of join and banded range join.

The reference has no as-of/range joins (SURVEY §2.3 note) — these are the
charter's forward-looking event-time operators, the shapes every
training-data / clickstream pipeline needs and that Spark has no native
operator for. Both are implemented as compositions of built-in DataFrame
ops (no UDFs, no cross joins), designed so the shuffle structure survives
100 TB:

- **As-of join** (``asof_join_clicks``): the naive formulation — join all
  earlier right rows, keep the max — explodes to O(|L|·|R|) per key before
  aggregating. The union+window form here shuffles each input exactly once
  (one exchange on the key), sorts within partitions, and resolves every
  as-of match with ``last(ignorenulls)`` over a running frame — linear in
  input size, the textbook distributed as-of (same strategy Flink and
  kdb-style engines use).

- **Banded range join** (``range_join_click_bursts``): an inequality-only
  join degenerates to BroadcastNestedLoopJoin in Spark (O(|L|·|R|) work).
  Bucketing event time to the band width turns it into an equi-join on
  (key, bucket) ∪ (key, bucket−1) — candidates are only rows within one
  bucket of each other, then the exact band predicate filters. Candidate
  count is O(true matches + band-adjacent near-misses), and the join key
  (user, time-bucket) is well-distributed even when a single user is hot
  across time.

Oracles: DuckDB's native ``ASOF JOIN`` and a plain inequality join — the
small-data formulations — must produce identical rows, proving the
distributed compositions correct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import md5_mod_hash_duck, md5_mod_hash_sql


def _epoch_us(c: Column) -> Column:
    """Microseconds since epoch, tolerant of TIMESTAMP_NTZ inputs.

    The fixture parquet stores naive timestamps, which pyspark ≥ 4.1 reads
    as TIMESTAMP_NTZ, and ``unix_micros`` strictly requires TIMESTAMP.
    With the session timezone pinned to UTC (session.py) the cast is
    value-exact on NTZ and a no-op on TIMESTAMP_LTZ."""
    return F.unix_micros(c.cast("timestamp"))

BAND_SECONDS = 300  # range-join band: clicks within 5 minutes before an error
ASOF_BUCKET_SECONDS = 86400  # as-of composite window key: coarse time bucket
# appended to user_id so a pathologically hot user parallelizes across
# buckets instead of serializing one window task (VERDICT r1/r2 skew item)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ``error`` event, the most recent ``click`` by the same
    user at or before the error (NULL if none) — event attribution as a
    distributed as-of join.

    Shape: clicks are first deduplicated to one per (user, ts) (max
    event_id — makes ties deterministic in both engines), then unioned
    with errors under a side tag and resolved with a two-level window:

    1. **Local pass** over ``(user_id, bkt)`` — bkt is the
       ASOF_BUCKET_SECONDS-coarse time bucket — computes the running
       ``last(click) IGNORE NULLS`` within each bucket, ordered by
       (ts, side) so a click at exactly the error's timestamp is visible
       (``<=`` semantics, matching ASOF JOIN's ``ts <= ts``).
    2. **Stitch pass**: per-(user, bucket) last-click summaries (one row
       per bucket, aggregated WITHOUT a new exchange — the groupBy reuses
       the local window's (user_id, bkt) partitioning) get a carry-in via
       ``last IGNORE NULLS`` over buckets strictly before the current one.
       This window partitions by user alone but runs over the SUMMARY
       relation — a hot user contributes #buckets rows here, not #events,
       so the skewed-key work is bounded by the time range regardless of
       event volume. The carry relation is tiny and AQE broadcasts it back
       onto the local rows.

    The composite (user_id, bkt) window key is the skew fix VERDICT r1/r2
    asked for: every full-size exchange and window sorts on (user, bucket),
    and correctness is restitched from per-bucket boundaries (every click
    in an earlier bucket has strictly smaller ts, so
    ``coalesce(local, carry)`` is exactly the global as-of match).
    """
    ev = _events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("side"),
                F.lit(None).cast("long").alias("error_id"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("error_id"),
    )
    tagged = clicks.unionByName(errors).withColumn(
        "bkt",
        (
            _epoch_us(F.col("ts"))
            / F.lit(ASOF_BUCKET_SECONDS * 1_000_000)
        ).cast("long"),
    )
    click_struct = F.when(
        F.col("click_id").isNotNull(), F.struct("ts", "click_id")
    )
    w_local = (
        Window.partitionBy("user_id", "bkt")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "local_click", F.last(click_struct, ignorenulls=True).over(w_local)
    )
    # struct max orders by ts first (one click per (user, ts) after the
    # dedup above), so this is "the latest click in the bucket"
    summary = local.groupBy("user_id", "bkt").agg(
        F.max(click_struct).alias("bucket_last_click")
    )
    w_carry = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        "user_id",
        "bkt",
        F.last("bucket_last_click", ignorenulls=True)
        .over(w_carry)
        .alias("carry_click"),
    )
    resolved = local.join(carry, ["user_id", "bkt"]).withColumn(
        "best", F.coalesce("local_click", "carry_click")
    )
    return (
        resolved.filter(F.col("side") == 1)
        .select(
            "user_id",
            "error_id",
            F.col("ts").alias("error_ts"),
            F.col("best.click_id").alias("click_id"),
            F.col("best.ts").alias("click_ts"),
            (
                _epoch_us(F.col("ts"))
                - _epoch_us(F.col("best.ts"))
            ).alias("gap_us"),
        )
    )


def range_join_click_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many clicks the same user made in the
    ``(error_ts - 5 min, error_ts]`` band, and their total value — a
    banded range join via time-bucket candidate generation.

    A click at most BAND_SECONDS before the error lives in the same
    5-minute bucket as the error or the one just below it, so the
    inequality join becomes: explode each error to (bucket, bucket-1) and
    equi-join clicks on (user_id, bucket) — candidates then pass the exact
    band predicate. Equi-join keys keep this a shuffled hash join (never a
    nested-loop), and AQE handles residual bucket skew.
    """
    ev = _events(spark, sf_dir)
    bucket = lambda c: (_epoch_us(c) / F.lit(BAND_SECONDS * 1_000_000)).cast("long")  # noqa: E731
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
        bucket(F.col("ts")).alias("bkt"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        bucket(F.col("ts")).alias("err_bkt"),
    )
    cand_buckets = errors.withColumn(
        "bkt", F.explode(F.array(F.col("err_bkt"), F.col("err_bkt") - 1))
    )
    matched = cand_buckets.join(clicks, ["user_id", "bkt"]).filter(
        (F.col("click_ts") > F.col("error_ts") - F.expr(f"INTERVAL {BAND_SECONDS} SECONDS"))
        & (F.col("click_ts") <= F.col("error_ts"))
    )
    counts = matched.groupBy("user_id", "error_id", "error_ts").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(
            F.col("click_value").cast("decimal(30,2)")
        ).cast("double").alias("click_value_total"),
    )
    # left join back so zero-click errors appear with n_clicks = 0
    # (the oracle's LEFT JOIN shape); the join is on the error key, which
    # is unique, so this is a cheap 1:1 hash join.
    return (
        errors.select("user_id", "error_id", "error_ts")
        .join(counts, ["user_id", "error_id", "error_ts"], "left")
        .select(
            "user_id",
            "error_id",
            "error_ts",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce(
                "click_value_total", F.lit(0.0)
            ).alias("click_value_total"),
        )
    )


# --- Calendar-spine gap filling with forward fill (r8) ------------------------
#
# The third charter temporal operator: time-series gap filling — generate
# the full calendar spine, left-join the observed daily aggregate, and
# FORWARD-FILL each gap with the latest prior observation (plus gap
# flags and staleness age), the shape every metrics/feature pipeline
# runs before a model ever sees a daily series. Spark has no native
# ``fill forward``; the composition here is the portable one:
#
#   grp  = COUNT(observed) OVER (PARTITION BY key ORDER BY day)  — the
#          running observation count, which is CONSTANT across each
#          observation-then-gap run and increments exactly at the next
#          observation;
#   fill = MAX(observed)  OVER (PARTITION BY key, grp)           — each
#          run contains exactly one observation (its first row), so the
#          unordered per-run aggregate IS the forward fill.
#
# This avoids ``last_value IGNORE NULLS`` (supported inconsistently
# across engines) and keeps every window PARTITIONED BY KEY — at 100 TB
# the spine is millions of entities × days and no global sort ever
# happens. The fixture series has no natural gaps (all 30 days present
# for every type), so a deterministic hash-bucketed "feed outage" drops
# ~20% of (type, day) cells — stated identically in both engines, the
# same salted-md5-bucket device as pipeline.py's splits — making leading
# gaps, interior runs, and staleness ages all real in the output.

_GF_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"
_GF_OUTAGE_MOD = 5  # drop cells whose bucket ≡ 0 → ~20% outage rate
_GF_OUTAGE_KEY_SQL = "CONCAT('outage:', event_type, ':', CAST(day AS STRING))"
_GF_OUTAGE_KEY_DUCK = "('outage:' || event_type || ':' || CAST(day AS VARCHAR))"


def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, calendar day): observed cents (NULL in a gap),
    forward-filled cents, gap flag, and days-since-last-observation —
    the full spine relation, row-for-row oracle-matched."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = (
        ev.groupBy(
            "event_type", F.expr("CAST(ts AS DATE)").alias("day")
        )
        .agg(F.expr(f"SUM({_GF_CENTS})").alias("cents"))
        .filter(
            # one owner for the cross-engine md5→60-bit-parse device
            # (functions/text.py), composed with the outage modulus
            F.expr(
                f"{md5_mod_hash_sql(_GF_OUTAGE_KEY_SQL)}"
                f" % {_GF_OUTAGE_MOD} != 0"
            )
        )
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("day"),
        )
    )
    j = spine.join(daily, ["event_type", "day"], "left")
    return forward_fill(j, key="event_type", day="day", val="cents").orderBy(
        "event_type", "day"
    )


def forward_fill(
    j: DataFrame, key: str, day: str, val: str
) -> DataFrame:
    """The portable forward-fill core (docstring above) over a spine
    frame ``(key, day, val-nullable)``: returns (key, day,
    <val>_observed, <val>_filled, is_gap, days_since_obs). Rows before
    a key's first observation stay NULL-filled with NULL staleness (the
    grp = 0 run has nothing to carry) — locked by the synthetic
    leading-gap unit test."""
    w_cum = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = j.withColumn("grp", F.count(val).over(w_cum))
    w_run = Window.partitionBy(key, "grp")
    return g.select(
        key,
        day,
        F.col(val).alias(f"{val}_observed"),
        F.max(val).over(w_run).alias(f"{val}_filled"),
        F.col(val).isNull().cast("int").alias("is_gap"),
        F.when(
            F.col("grp") > 0,
            F.datediff(F.col(day), F.min(day).over(w_run)),
        ).alias("days_since_obs"),
    )


QUERIES = {
    "asof_join_clicks": asof_join_clicks,
    "range_join_click_bursts": range_join_click_bursts,
    "gap_fill_daily_revenue": gap_fill_daily_revenue,
}


ORACLES = {
    # the identical spine → outage filter → run-group forward fill,
    # restated with DuckDB's generate_series and the same window pair
    "gap_fill_daily_revenue": (
        # final sums CAST to BIGINT (SUM(BIGINT) widens to HUGEINT in
        # DuckDB — r8 review); the outage bucket reuses the shared
        # md5_mod_hash device, one owner per engine
        "WITH daily_all AS (SELECT event_type, CAST(ts AS DATE) AS day,"
        f" CAST(SUM({_GF_CENTS}) AS BIGINT) AS cents FROM events"
        " WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),"
        " daily AS (SELECT * FROM daily_all WHERE"
        f" {md5_mod_hash_duck(_GF_OUTAGE_KEY_DUCK)} % {_GF_OUTAGE_MOD}"
        " != 0),"
        " b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),"
        " spine AS (SELECT t.event_type,"
        " CAST(unnest(generate_series(CAST(b.d0 AS TIMESTAMP),"
        " CAST(b.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day"
        " FROM (SELECT DISTINCT event_type FROM daily) t, b),"
        " j AS (SELECT s.event_type, s.day, d.cents FROM spine s"
        " LEFT JOIN daily d USING (event_type, day)),"
        " g AS (SELECT *, COUNT(cents) OVER (PARTITION BY event_type"
        " ORDER BY day ROWS UNBOUNDED PRECEDING) AS grp FROM j)"
        " SELECT event_type, day,"
        " cents AS cents_observed,"
        " MAX(cents) OVER (PARTITION BY event_type, grp)"
        " AS cents_filled,"
        " CAST(cents IS NULL AS INT) AS is_gap,"
        " CAST(CASE WHEN grp > 0 THEN day - MIN(day) OVER"
        " (PARTITION BY event_type, grp) END AS INT) AS days_since_obs"
        " FROM g ORDER BY event_type, day"
    ),
    # DuckDB's native ASOF JOIN over the same deduplicated click relation;
    # epoch_us on both sides matches Spark's unix_micros exactly (µs longs).
    "asof_join_clicks": (
        "WITH clicks AS (SELECT user_id, ts, MAX(event_id) AS click_id"
        " FROM events WHERE event_type = 'click' GROUP BY user_id, ts),"
        " errors AS (SELECT user_id, event_id AS error_id, ts AS error_ts"
        " FROM events WHERE event_type = 'error')"
        " SELECT e.user_id, e.error_id, e.error_ts,"
        " c.click_id, c.ts AS click_ts,"
        " epoch_us(e.error_ts) - epoch_us(c.ts) AS gap_us"
        " FROM errors e ASOF LEFT JOIN clicks c"
        " ON e.user_id = c.user_id AND c.ts <= e.error_ts"
    ),
    "range_join_click_bursts": (
        "WITH clicks AS (SELECT user_id, ts AS click_ts, value AS click_value"
        " FROM events WHERE event_type = 'click'),"
        " errors AS (SELECT user_id, event_id AS error_id, ts AS error_ts"
        " FROM events WHERE event_type = 'error')"
        " SELECT e.user_id, e.error_id, e.error_ts,"
        " COUNT(c.click_ts) AS n_clicks,"
        " CAST(COALESCE(SUM(CAST(c.click_value AS DECIMAL(30,2))), 0)"
        "      AS DOUBLE) AS click_value_total"
        " FROM errors e LEFT JOIN clicks c"
        " ON c.user_id = e.user_id"
        f" AND c.click_ts > e.error_ts - INTERVAL {BAND_SECONDS} SECONDS"
        " AND c.click_ts <= e.error_ts"
        " GROUP BY e.user_id, e.error_id, e.error_ts"
    ),
}
