"""Event-sequence analytics over the ``events`` table: funnel conversion,
cohort retention, and the incremental rollup-merge pattern.

Charter extension (the reference's analytics stop at the sales fact;
SURVEY §2.11 note): the product-analytics shapes every event warehouse
runs, each expressed so the shuffle structure survives 100 TB:

- **funnel**: ordered-stage conversion (view → click → purchase). Three
  min-aggregates chained by per-user joins — every stage shuffles on the
  SAME user_id key, so the co-partitioning is reused (no re-exchange
  between stages under AQE) and no window ever sees more than one user's
  rows.
- **cohort retention**: users grouped by first-seen week, checked for
  activity exactly one week later. first-seen is a min-aggregate; the
  retention probe is an equi-join on (user, week+7) against the distinct
  (user, week) activity relation.
- **rollup merge**: the lambda/incremental-view pattern — a precomputed
  daily rollup for closed days UNION an on-the-fly aggregate of the open
  tail, equal BY CONSTRUCTION to the full aggregate (the oracle computes
  the full aggregate, so the equality is what the driver verifies). At
  100 TB the rollup side is a tiny pre-aggregated table and only the tail
  scans raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.numeric import dsum_sql

ROLLUP_CUTOFF = "2024-01-28"  # days < cutoff come from the rollup,
# days >= cutoff from the raw tail (the fixture events span 2024-01-01 …
# 2024-01-30, so the tail holds the last three open days)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed; of those, whose first click is at
    or after their first view; of those, whose first purchase is at or
    after that click. One row of stage counts + exact conversion rates."""
    ev = _events(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    staged = (
        views.join(clicks.select("user_id", "t_click"), "user_id", "left")
        .join(purchases.select("user_id", "t_purchase"), "user_id", "left")
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
        (F.count("t_click") / F.count(F.lit(1))).alias("view_to_click"),
        (F.count("t_purchase") / F.count(F.lit(1))).alias(
            "view_to_purchase"
        ),
    )


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohorts (first-seen week) × one-week retention: of each
    cohort, how many users were active again in the following week."""
    ev = _events(spark, sf_dir)
    week = F.date_trunc("week", "ts").cast("date")
    activity = ev.select(
        "user_id", week.alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    ret = activity.select(
        F.col("user_id").alias("r_user"), F.col("week").alias("ret_week")
    )
    retained = (
        cohorts.join(
            ret,
            (F.col("r_user") == F.col("user_id"))
            & (F.col("ret_week") == F.date_add("cohort_week", 7)),
        )
        .select("user_id")
        .distinct()
        .withColumn("is_retained", F.lit(1))
    )
    return (
        cohorts.join(retained, "user_id", "left")
        .groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("is_retained").alias("n_retained_w1"),
            (F.count("is_retained") / F.count(F.lit(1))).alias(
                "retention_w1"
            ),
        )
        .orderBy("cohort_week")
    )


def events_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view pattern: daily per-type totals where closed days
    come from a pre-aggregated rollup and the open tail from raw events —
    union must equal the full aggregate (the oracle computes it whole)."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", "ts").cast("date")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("date")
    agg = lambda df: (  # noqa: E731 - shared aggregate shape
        df.groupBy(day.alias("day"), "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum_sql("value")).alias("total_value"),
        )
    )
    rollup = agg(ev.filter(day < cutoff))  # at scale: a stored table
    tail = agg(ev.filter(day >= cutoff))
    return rollup.unionByName(tail).orderBy("day", "event_type")


PATH_K = 10  # top-k 3-step paths


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k 3-step behavioral paths: per-user event streams ordered by
    (ts, event_id), consecutive event-type trigrams counted corpus-wide
    — the path-analysis primitive behind "what do users do before
    purchasing".  The windows partition by user (never a global sort);
    the trigram count is a map-side-combined hash aggregate +
    TakeOrderedAndProject.  Ties rank deterministically by path text."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter(F.col("t2").isNotNull())
        .select(
            # concat, not concat_ws: NULL must propagate exactly like the
            # oracle's `||` (concat_ws would silently SKIP a NULL type and
            # produce a two-step path; no fixture has NULL event_type, but
            # the operator shouldn't rely on that)
            F.concat(
                "event_type", F.lit(">"), "t1", F.lit(">"), "t2"
            ).alias("path")
        )
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(PATH_K)
    )


_CENTS_EV = "CAST(ROUND(value * 100) AS BIGINT)"  # house cents discipline


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution with EXACT largest-remainder cent
    apportionment: each purchase's value (in cents) is split across the
    same user's clicks in the preceding attribution window — every click
    gets ``cents DIV n``, and the ``cents % n`` remainder cents go one
    each to the EARLIEST clicks, so the credits are integers, sum exactly
    to the purchase value (conservation by construction), and carry no
    engine-divergent float division. Output: per click-day credited
    totals.

    Scale: the pair build is the user-key equi-join with the interval as
    residual predicate (the click_purchase_pairs shape, streaming/
    events.py:301); the apportionment windows partition by purchase_id —
    never more than one purchase's pairs in a partition, no global sort.
    """
    from pyspark.sql import Window

    from ..streaming.events import ATTRIBUTION_WINDOW

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.expr(_CENTS_EV).alias("cents"),
    )
    pairs = purchases.join(
        clicks,
        F.expr(
            "c_user_id = p_user_id"
            f" AND click_ts >= purchase_ts - INTERVAL {ATTRIBUTION_WINDOW}"
            " AND click_ts <= purchase_ts"
        ),
        "inner",
    )
    # one sort serves both frames: the ordered row_number and the
    # whole-partition count share the (purchase_id, click_ts, click_id)
    # window spec
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    credited = (
        pairs.withColumn(
            "n",
            F.count(F.lit(1)).over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("k", F.row_number().over(w) - 1)
        .withColumn(
            "credit",
            F.expr("cents DIV n + IF(k < cents % n, 1, 0)"),
        )
    )
    return (
        credited.groupBy(F.col("click_ts").cast("date").alias("click_day"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").alias("credited_cents"),
            F.sum(
                F.expr("((credit % 1000000007) * (click_id % 1000000007))"
                       " % 1000000007")
            ).alias("credit_binding"),
        )
        .orderBy("click_day")
    )


def funnel_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user who purchased at or after
    their first view, the first-view → first-purchase latency, folded
    into hour-wide buckets. Latency is EXACT integer microseconds
    (``unix_micros`` ↔ ``epoch_us``; the fixture timestamps carry µs
    precision, so second-truncating datediffs would be lossy) and the
    bucket is integer division — no float anywhere.

    Scale: two min-aggregates on the same user_id key (co-partitioned,
    reused exchange under AQE) + one equi-join; the histogram fold is
    map-side combined into ≤ hours-of-span rows."""
    ev = _events(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = (
        views.join(purchases, "user_id")
        .filter(F.col("t_purchase") >= F.col("t_view"))
        .select(
            "user_id",
            F.expr(
                "unix_micros(CAST(t_purchase AS TIMESTAMP))"
                " - unix_micros(CAST(t_view AS TIMESTAMP))"
            ).alias("lat_us"),
        )
    )
    return (
        lat.withColumn("bucket_h", F.expr("lat_us DIV 3600000000"))
        .groupBy("bucket_h")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.expr("lat_us DIV 1000000")).alias("sum_latency_s"),
            F.min("lat_us").alias("min_lat_us"),
            F.max("lat_us").alias("max_lat_us"),
            F.sum(F.expr("user_id % 1000000007")).alias("user_binding"),
        )
        .orderBy("bucket_h")
    )


RETENTION_MAX_OFFSET = 4


def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retention triangle: (first-seen week × week offset
    0..{RETENTION_MAX_OFFSET}) active-user counts — the generalization of
    :func:`cohort_retention_weekly`'s single w1 column. The (user, week)
    activity relation is distinct, so each user contributes at most one
    row per (cohort, offset) cell and the cell fold is a plain COUNT.

    Scale: one distinct + one min-aggregate on user_id (co-partitioned),
    one self-equi-join on user_id; the matrix is weeks² rows."""
    ev = _events(spark, sf_dir)
    week = F.date_trunc("week", "ts").cast("date")
    activity = ev.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    m = (
        cohorts.join(activity, "user_id")
        .withColumn(
            "week_offset",
            F.expr("datediff(week, cohort_week) DIV 7"),
        )
        .filter(F.col("week_offset") <= RETENTION_MAX_OFFSET)
    )
    return (
        m.groupBy("cohort_week", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.expr("user_id % 1000000007")).alias("user_binding"),
        )
        .orderBy("cohort_week", "week_offset")
    )


CDC_CUTOFF = "2024-01-20 00:00:00"


def cdc_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of state reconstruction from an event log (the CDC replay /
    time-travel primitive): treating ``events`` as a change log keyed by
    user, the state at :data:`CDC_CUTOFF` is each user's LAST event at or
    before the cutoff — last-writer-wins with the deterministic
    (ts, event_id) order. Output: the reconstructed state folded per
    last-event type.

    Scale: the cutoff filter prunes the scan; one row_number window
    partitioned by user (never global); the fold is a tiny hash
    aggregate. This is exactly how a lakehouse CDF snapshot-at-T is
    derived when only the log is stored."""
    from pyspark.sql import Window

    ev = (
        _events(spark, sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & (F.col("ts") <= F.lit(CDC_CUTOFF).cast("timestamp"))
        )
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.expr(_CENTS_EV).alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last = ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (
        last.groupBy(F.col("event_type").alias("last_event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").alias("last_value_cents"),
            F.max("ts").alias("latest_ts"),
            F.sum(F.expr("user_id % 1000000007")).alias("user_binding"),
        )
        .orderBy("last_event_type")
    )


def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the new / retained / resurrected /
    churned user ledger every product-analytics warehouse maintains:

    - **new**: first-ever activity on this day,
    - **retained**: active this day AND the previous day,
    - **resurrected**: active this day, not the previous day, seen before,
    - **churned** (reported on day d): active on d−1, not on d.

    One FULL OUTER self-join of the distinct (user, day) activity
    relation against itself shifted +1 day classifies every (user, day)
    into exactly one bucket; first-seen days come from one min-aggregate.
    All counts are exact; the identity ``active(d) = new + retained +
    resurrected`` holds by construction.

    Scale: distinct + min-agg + the self-join all hash on user-led keys;
    no window, no global sort; output is one row per day."""
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    a = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    first = a.groupBy("user_id").agg(F.min("day").alias("first_day"))
    today = a.select("user_id", "day")
    yesterday = a.select(
        F.col("user_id").alias("y_user"),
        F.date_add("day", 1).alias("y_next"),
    )
    j = (
        today.join(
            yesterday,
            (F.col("user_id") == F.col("y_user"))
            & (F.col("day") == F.col("y_next")),
            "full_outer",
        )
        .select(
            F.coalesce("user_id", "y_user").alias("u"),
            F.coalesce("day", "y_next").alias("d"),
            F.col("user_id").isNotNull().alias("active"),
            F.col("y_user").isNotNull().alias("was_active"),
        )
        .join(
            first.select(
                F.col("user_id").alias("f_user"), "first_day"
            ),
            F.col("u") == F.col("f_user"),
        )
    )
    is_new = F.col("active") & (F.col("d") == F.col("first_day"))
    is_ret = F.col("active") & F.col("was_active") & (
        F.col("d") != F.col("first_day")
    )
    is_res = (
        F.col("active")
        & ~F.col("was_active")
        & (F.col("d") != F.col("first_day"))
    )
    is_churn = ~F.col("active") & F.col("was_active")
    return (
        j.groupBy(F.col("d").alias("day"))
        .agg(
            F.sum(is_new.cast("long")).alias("n_new"),
            F.sum(is_ret.cast("long")).alias("n_retained"),
            F.sum(is_res.cast("long")).alias("n_resurrected"),
            F.sum(is_churn.cast("long")).alias("n_churned"),
            F.sum(
                F.when(F.col("active"), F.expr("u % 1000000007")).otherwise(
                    0
                )
            ).alias("active_binding"),
        )
        .orderBy("day")
    )


MARKOV_QUANT = 1 << 10


def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (from_type, to_type) pair of CONSECUTIVE events (ordered by
    ts, event_id within a user), the transition count and the
    2^-10-quantized conditional probability P(to | from).

    The per-user lead window is bounded-state (same shape as
    `event_path_trigrams`); the matrix itself is |types|² rows — driver-
    size at any corpus scale — and the probability divide is one exact
    IEEE division of two BIGINTs (identical in both engines), so parity
    is strict.  No reference counterpart; charter extension in the
    product-analytics family."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type", 1).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.select(
            "from_type",
            "to_type",
            "n",
            F.expr(
                "CAST(FLOOR(CAST(n AS DOUBLE)"
                " / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)"
                f" * {MARKOV_QUANT}.0 + 0.5) AS BIGINT)"
            ).alias("p_q"),
        )
        .orderBy("from_type", "to_type")
    )


# canonical-integer gate shared by the Spark plan and the DuckDB oracle:
# both engines' bare string→BIGINT coercions disagree on non-canonical
# numerics (see json_props_stats docstring), so both sides parse ONLY
# strings matching this and NULL the rest.  ONE definition, interpolated
# into BOTH the Spark expression and the DuckDB oracle (ADVICE r10), and
# anchored with \A/\z rather than ^/$ because Java's '$' also matches
# before a trailing newline while RE2's does not — '7\n' would parse on
# Spark but NULL in DuckDB under ^...$ (ADVICE r10).  Both Java regex
# and RE2 support \A (start of input) and \z (absolute end of input).
_INT_RE = r"\A-?[0-9]+\z"


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingest: parse the JSON ``props`` payload
    (``{"k": int}``) with each engine's native JSON path extractor and
    aggregate per event type — the schema-on-read pattern for raw event
    feeds.  Extraction is a map-side scalar (Spark's codegen'd
    ``get_json_object`` vs DuckDB's ``json_extract_string``); the
    aggregate is one hash pass, so the whole query is a single scan at
    any scale.  All outputs are exact integers.  Extraction is
    corrupt-row tolerant on BOTH engines and SYMMETRICALLY so (ADVICE
    r8 + r9): Spark's ``get_json_object`` already NULLs malformed JSON
    and the DuckDB oracle gates on ``json_valid`` (its
    ``json_extract_string`` RAISES on malformed input).  The numeric
    cast is gated on a strict integral regex on BOTH engines before
    casting, because the engines' bare string→BIGINT coercions genuinely
    diverge on fractional payloads — ``try_cast('12.5')`` truncates to
    12 in non-ANSI Spark while DuckDB's ``TRY_CAST`` ROUNDS to 13 (and
    DuckDB also accepts padded/'+5' forms Spark-divergently) — so only
    canonical integer strings parse and everything else (fractional,
    padded, signed-plus, garbage, overflow via the residual try_cast)
    degrades to NULL identically.  The dirty-payload symmetry is locked
    by tests/test_json_props_symmetry.py, which runs the SAME extraction
    (:func:`_json_props_agg`) and the SAME oracle SQL over a literal
    table of every divergence class."""
    return _json_props_agg(_events(spark, sf_dir))


def _json_props_agg(ev: DataFrame) -> DataFrame:
    """The production extraction + aggregate over any (event_type,
    props) relation — separated so the symmetry test exercises the exact
    expression text the operator runs."""
    # single JSON parse per row: regexp_extract applies the integral
    # gate and yields '' on a non-match, which try_cast NULLs — same
    # semantics as the two-call CASE gate at half the parse cost.  The
    # pattern is built from _INT_RE through the Python function API (not
    # an f-string SQL literal) so the Spark gate and the DuckDB oracle
    # provably share one regex definition and SQL-parser backslash
    # escaping can't diverge them (ADVICE r10).
    k = F.regexp_extract(
        F.get_json_object("props", "$.k"), f"({_INT_RE})", 1
    ).try_cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct(F.expr("k % 10")).alias("n_k_mod_buckets"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "cohort_retention_weekly": cohort_retention_weekly,
    "events_rollup_merge": events_rollup_merge,
    "event_path_trigrams": event_path_trigrams,
    "multi_touch_attribution": multi_touch_attribution,
    "funnel_latency_histogram": funnel_latency_histogram,
    "cohort_retention_matrix": cohort_retention_matrix,
    "cdc_state_asof": cdc_state_asof,
    "growth_accounting_daily": growth_accounting_daily,
    "event_markov_transitions": event_markov_transitions,
    "json_props_stats": json_props_stats,
}

ORACLES = {
    "funnel_view_click_purchase": (
        "WITH views AS (SELECT user_id, MIN(ts) AS t_view FROM events"
        " WHERE event_type = 'view' GROUP BY user_id),"
        " clicks AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e"
        " JOIN views v ON e.user_id = v.user_id"
        " WHERE e.event_type = 'click' AND e.ts >= v.t_view"
        " GROUP BY e.user_id),"
        " purchases AS (SELECT e.user_id, MIN(e.ts) AS t_purchase"
        " FROM events e JOIN clicks c ON e.user_id = c.user_id"
        " WHERE e.event_type = 'purchase' AND e.ts >= c.t_click"
        " GROUP BY e.user_id),"
        " staged AS (SELECT v.user_id, c.t_click, p.t_purchase"
        " FROM views v LEFT JOIN clicks c ON v.user_id = c.user_id"
        " LEFT JOIN purchases p ON v.user_id = p.user_id)"
        " SELECT COUNT(*) AS n_viewed,"
        " COUNT(t_click) AS n_clicked,"
        " COUNT(t_purchase) AS n_purchased,"
        " CAST(COUNT(t_click) AS DOUBLE) / COUNT(*) AS view_to_click,"
        " CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(*) AS view_to_purchase"
        " FROM staged"
    ),
    "cohort_retention_weekly": (
        "WITH activity AS (SELECT DISTINCT user_id,"
        " CAST(date_trunc('week', ts) AS DATE) AS week FROM events),"
        " cohorts AS (SELECT user_id, MIN(week) AS cohort_week"
        " FROM activity GROUP BY user_id),"
        " retained AS (SELECT DISTINCT c.user_id FROM cohorts c"
        " JOIN activity a ON a.user_id = c.user_id"
        " AND a.week = c.cohort_week + INTERVAL 7 DAY)"
        " SELECT cohort_week, COUNT(*) AS n_users,"
        " COUNT(r.user_id) AS n_retained_w1,"
        " CAST(COUNT(r.user_id) AS DOUBLE) / COUNT(*) AS retention_w1"
        " FROM cohorts c LEFT JOIN retained r ON c.user_id = r.user_id"
        " GROUP BY cohort_week ORDER BY cohort_week"
    ),
    "events_rollup_merge": (
        f"SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,"
        f" COUNT(*) AS n_events, {dsum_sql('value')} AS total_value"
        f" FROM events GROUP BY 1, 2 ORDER BY day, event_type"
    ),
}

# identical per-user window, identical trigram text, identical tie-break
ORACLES["event_path_trigrams"] = (
    "WITH s AS (SELECT user_id, event_type,"
    " LEAD(event_type, 1) OVER w AS t1,"
    " LEAD(event_type, 2) OVER w AS t2"
    " FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL"
    " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
    " SELECT event_type || '>' || t1 || '>' || t2 AS path,"
    " COUNT(*) AS n FROM s WHERE t2 IS NOT NULL"
    " GROUP BY path ORDER BY n DESC, path LIMIT 10"
)

# the identical pair join + largest-remainder apportionment restated:
# integer DIV/% throughout, remainder cents to the earliest clicks, the
# window constant interpolated from streaming/events.py (single owner)
def _attribution_oracle() -> str:
    from ..streaming.events import ATTRIBUTION_WINDOW

    return (
        "WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id"
        " FROM events WHERE event_type = 'click'),"
        " p AS (SELECT user_id, ts AS purchase_ts,"
        " event_id AS purchase_id,"
        f" {_CENTS_EV} AS cents"
        " FROM events WHERE event_type = 'purchase'),"
        " pr AS (SELECT p.purchase_id, p.cents, c.click_id, c.click_ts"
        " FROM p JOIN c ON c.user_id = p.user_id"
        f" AND c.click_ts >= p.purchase_ts - INTERVAL '{ATTRIBUTION_WINDOW}'"
        " AND c.click_ts <= p.purchase_ts),"
        " w AS (SELECT *,"
        " COUNT(*) OVER (PARTITION BY purchase_id) AS n,"
        " ROW_NUMBER() OVER (PARTITION BY purchase_id"
        " ORDER BY click_ts, click_id) - 1 AS k FROM pr),"
        " cr AS (SELECT *, cents // n"
        " + CASE WHEN k < cents % n THEN 1 ELSE 0 END AS credit FROM w)"
        " SELECT CAST(click_ts AS DATE) AS click_day,"
        " COUNT(*) AS n_credits,"
        " CAST(SUM(credit) AS BIGINT) AS credited_cents,"
        " CAST(SUM(((credit % 1000000007) * (click_id % 1000000007))"
        " % 1000000007) AS BIGINT) AS credit_binding"
        " FROM cr GROUP BY 1 ORDER BY 1"
    )


ORACLES["multi_touch_attribution"] = _attribution_oracle()

# exact-microsecond latency fold restated (epoch_us is DuckDB's
# unix_micros); identical integer divisions
ORACLES["funnel_latency_histogram"] = (
    "WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events"
    " WHERE event_type = 'view' GROUP BY user_id),"
    " p AS (SELECT user_id, MIN(ts) AS t_purchase FROM events"
    " WHERE event_type = 'purchase' GROUP BY user_id),"
    " l AS (SELECT v.user_id,"
    " epoch_us(t_purchase) - epoch_us(t_view) AS lat_us"
    " FROM v JOIN p ON p.user_id = v.user_id"
    " WHERE t_purchase >= t_view)"
    " SELECT lat_us // 3600000000 AS bucket_h,"
    " COUNT(*) AS n_users,"
    " CAST(SUM(lat_us // 1000000) AS BIGINT) AS sum_latency_s,"
    " MIN(lat_us) AS min_lat_us, MAX(lat_us) AS max_lat_us,"
    " CAST(SUM(user_id % 1000000007) AS BIGINT) AS user_binding"
    " FROM l GROUP BY bucket_h ORDER BY bucket_h"
)

# the triangle restated: distinct activity, min-week cohorts, day-diff
# integer-divided into week offsets
ORACLES["cohort_retention_matrix"] = (
    "WITH a AS (SELECT DISTINCT user_id,"
    " CAST(date_trunc('week', ts) AS DATE) AS week FROM events),"
    " c AS (SELECT user_id, MIN(week) AS cohort_week FROM a"
    " GROUP BY user_id),"
    " m AS (SELECT c.user_id, c.cohort_week,"
    " date_diff('day', c.cohort_week, a.week) // 7 AS week_offset"
    " FROM c JOIN a ON a.user_id = c.user_id)"
    " SELECT cohort_week, week_offset, COUNT(*) AS n_active,"
    " CAST(SUM(user_id % 1000000007) AS BIGINT) AS user_binding"
    f" FROM m WHERE week_offset <= {RETENTION_MAX_OFFSET}"
    " GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"
)

# last-writer-wins restated with the identical (ts, event_id) DESC
# row_number; the cutoff literal is interpolated from the shared constant
ORACLES["cdc_state_asof"] = (
    "WITH e AS (SELECT user_id, ts, event_id, event_type,"
    f" {_CENTS_EV} AS cents FROM events"
    " WHERE user_id IS NOT NULL"
    f" AND ts <= TIMESTAMP '{CDC_CUTOFF}'),"
    " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id"
    " ORDER BY ts DESC, event_id DESC) AS rn FROM e)"
    " SELECT event_type AS last_event_type, COUNT(*) AS n_users,"
    " CAST(SUM(cents) AS BIGINT) AS last_value_cents,"
    " MAX(ts) AS latest_ts,"
    " CAST(SUM(user_id % 1000000007) AS BIGINT) AS user_binding"
    " FROM r WHERE rn = 1"
    " GROUP BY event_type ORDER BY last_event_type"
)

# the shifted full-outer self-join classification restated verbatim
ORACLES["growth_accounting_daily"] = (
    "WITH a AS (SELECT DISTINCT user_id,"
    " CAST(date_trunc('day', ts) AS DATE) AS day FROM events"
    " WHERE user_id IS NOT NULL),"
    " f AS (SELECT user_id, MIN(day) AS first_day FROM a GROUP BY user_id),"
    " t AS (SELECT user_id, day FROM a),"
    " y AS (SELECT user_id AS y_user, day + 1 AS y_next FROM a),"
    " j AS (SELECT COALESCE(t.user_id, y.y_user) AS u,"
    " COALESCE(t.day, y.y_next) AS d,"
    " t.user_id IS NOT NULL AS active,"
    " y.y_user IS NOT NULL AS was_active"
    " FROM t FULL OUTER JOIN y"
    " ON t.user_id = y.y_user AND t.day = y.y_next),"
    " c AS (SELECT j.*, f.first_day FROM j JOIN f ON f.user_id = j.u)"
    " SELECT d AS day,"
    " CAST(SUM(CASE WHEN active AND d = first_day THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_new,"
    " CAST(SUM(CASE WHEN active AND was_active AND d != first_day"
    " THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,"
    " CAST(SUM(CASE WHEN active AND NOT was_active AND d != first_day"
    " THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,"
    " CAST(SUM(CASE WHEN NOT active AND was_active THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_churned,"
    " CAST(SUM(CASE WHEN active THEN u % 1000000007 ELSE 0 END)"
    " AS BIGINT) AS active_binding"
    " FROM c GROUP BY d ORDER BY day"
)

ORACLES["event_markov_transitions"] = (
    "WITH seq AS (SELECT user_id, event_type AS from_type,"
    " LEAD(event_type, 1) OVER (PARTITION BY user_id"
    " ORDER BY ts, event_id) AS to_type FROM events"
    " WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
    " counts AS (SELECT from_type, to_type, COUNT(*) AS n FROM seq"
    " WHERE to_type IS NOT NULL GROUP BY from_type, to_type)"
    " SELECT from_type, to_type, n,"
    " CAST(FLOOR(CAST(n AS DOUBLE)"
    " / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)"
    f" * {MARKOV_QUANT}.0 + 0.5) AS BIGINT) AS p_q"
    " FROM counts ORDER BY from_type, to_type"
)

ORACLES["json_props_stats"] = (
    "WITH raw AS (SELECT event_type,"
    " CASE WHEN json_valid(props)"
    " THEN json_extract_string(props, '$.k') END AS s FROM events),"
    " k AS (SELECT event_type,"
    f" TRY_CAST(CASE WHEN regexp_matches(s, '{_INT_RE}')"
    " THEN s END AS BIGINT) AS k FROM raw)"
    " SELECT event_type, COUNT(*) AS n_events,"
    " COUNT(k) AS n_parsed,"
    " CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,"
    " CAST(COUNT(DISTINCT k % 10) AS BIGINT) AS n_k_mod_buckets"
    " FROM k GROUP BY event_type ORDER BY event_type"
)
