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


QUERIES = {
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "cohort_retention_weekly": cohort_retention_weekly,
    "events_rollup_merge": events_rollup_merge,
    "event_path_trigrams": event_path_trigrams,
    "multi_touch_attribution": multi_touch_attribution,
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
