"""Warehouse maintenance operators — 100 TB extensions.

- **Incremental materialized-view maintenance**: the production pattern
  for keeping a rollup current without re-scanning history — the stored
  MV holds PARTIAL aggregates (count + exact integer sum per cell), a
  new-data batch aggregates the same partials over only its own rows,
  and the refresh is a cells-level merge (union → re-aggregate), exactly
  how Spark's own map-side combine merges partial states.  The oracle
  certifies the algebra from the other direction: one direct GROUP BY
  over the full table — merge-of-partials must equal recompute, cell for
  cell.  At 100 TB the merge touches O(cells) + O(batch), never history.
- **Robust anomaly detection** over the daily revenue series: median/MAD
  z-scores (the outlier-resistant alternative to mean/stddev, standard
  for pipeline-health monitoring).  The heavy lift — folding 100 TB of
  facts to one row per day — is a plain partial-aggregable GROUP BY; the
  median/MAD pass then runs on the tiny day series (thousands of rows),
  so the exact ``percentile`` sort never sees raw data.
- **CDC snapshot diff** (``snapshot_diff_orders``): the added/removed/
  changed/unchanged ledger from one key-equi full-outer join of two
  closed-form snapshots.

No reference counterpart (the reference recomputes every dashboard
aggregate from the base table per request, reference api/main.py:
179-235); charter extensions beside scd.py / sketches.py.

Parity: money is exact integer cents (scd.py's ROUND(×100) discipline);
counts/sums are integers, so the MV merge is wholly exact.  The anomaly
math is deterministic IEEE on exact operands: day sums are integers,
medians interpolate two exact values (both engines compute the identical
midpoint of .0-valued doubles far below 2^52), and the score chain
|x−med| / (1.4826·mad) is the same two-rounding sequence in both
engines — bit-identical doubles, no quantization needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import P

MV_CUTOFF = "2000-01-01"  # batch boundary: ~5y history + ~1.6y "new" data
EPOCH = "1995-01-01"
MAD_K = "1.4826"  # identical literal text in both engines
Z_MAX = "3.0"

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["orders"]


def mv_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh of the (month × status) revenue MV by merging the stored
    partials with the new batch's partials — certified against a direct
    full recompute (the oracle)."""
    o = _orders(spark, sf_dir).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.col("o_orderstatus").alias("status"),
        F.expr(_CENTS).alias("cents"),
        (F.col("o_orderdate") < F.lit(MV_CUTOFF).cast("timestamp")).alias(
            "is_base"
        ),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("month", "status").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )

    # null-safe split: a NULL o_orderdate makes is_base NULL, and plain
    # filter(is_base)/filter(NOT is_base) would BOTH drop the row while
    # the oracle's direct recompute keeps its (NULL, status) cell
    # (review r8 finding) — <=> TRUE keeps the partition total
    base = partials(o.filter("is_base <=> TRUE"))
    delta = partials(o.filter("NOT (is_base <=> TRUE)"))
    merged = (
        base.unionByName(delta)
        .groupBy("month", "status")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    return merged.select(
        "month",
        "status",
        "n_orders",
        "sum_cents",
        (
            F.col("sum_cents").cast("double")
            / F.col("n_orders").cast("double")
        ).alias("avg_cents"),
    ).orderBy("month", "status")


def _revenue_anomaly_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (plan tests target
    this seam; the public query wraps it in release_after_action)."""
    from ..functions.windows import register_cache

    # persist the tiny day series: the final plan references this
    # subtree four times (d3, med, mad chains), and pinning it makes the
    # fact scan count 1 by construction instead of relying on
    # ReuseExchange to unify the subplans (review r8 finding)
    daily = (
        _orders(spark, sf_dir)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.expr(_CENTS)).alias("x"))
    )
    daily = register_cache(daily)
    med = daily.agg(F.expr("percentile(x, 0.5)").alias("med"))
    d2 = daily.crossJoin(F.broadcast(med)).withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    mad = d2.agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    d3 = d2.crossJoin(F.broadcast(mad)).withColumn(
        "score",
        F.expr(
            "CASE WHEN mad = 0 THEN CAST(NULL AS DOUBLE)"
            f" ELSE dev / ({MAD_K} * mad) END"
        ),
    )
    flag = F.expr(f"CASE WHEN score > {Z_MAX} THEN 1 ELSE 0 END")
    out = d3.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(flag).cast("long").alias("n_anomalies"),
        F.sum(
            flag * F.expr(f"DATEDIFF(day, DATE '{EPOCH}')").cast("long")
        ).alias("day_binding"),
        F.max("score").alias("max_score"),
        F.max("med").alias("median_cents"),
        F.max("mad").alias("mad_cents"),
    )
    return out, (daily,)


def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-scores over the daily revenue series; one
    summary row (day count, anomalies, anomalous-day binding, extremes).
    One-shot pin lifecycle (VERDICT r10 #5): the day-series pin is
    consumed exactly once per invocation, so the final action runs here
    and the pin is released immediately instead of waiting for cap
    eviction."""
    from ..functions.windows import release_after_action

    out, pins = _revenue_anomaly_composed(spark, sf_dir)
    return release_after_action(out, *pins)


# --- small-file compaction planner --------------------------------------------

N_FILE_GROUPS = 32  # files per partition in the modeled inventory
ROW_OVERHEAD = 100  # per-row byte estimate: fixed overhead + payload term
TARGET_BYTES = 16_384  # compaction output target size

# per-row byte model: overhead + a row-varying payload term (l_quantity is
# integral-valued, so the BIGINT cast is exact in both engines)
_ROW_BYTES = f"({ROW_OVERHEAD} + CAST(l_quantity AS BIGINT))"


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan (the OPTIMIZE/bin-packing maintenance
    job every parquet lakehouse runs): derive the file inventory — one
    "file" per (ship-month, hash-slice) with its byte size — then pack
    files into output bins of :data:`TARGET_BYTES` with the greedy
    in-order rule ``bin = floor(bytes_before / target)`` per partition
    (Delta/Iceberg OPTIMIZE's per-partition greedy pack in file order).
    Output: one row per planned output bin.

    Scale: the inventory fold (100 TB of rows → one row per file) is a
    plain hash aggregate with map-side combine; the planning pass — the
    running-sum window — runs on FILE METADATA (millions of rows at
    100 TB, not data), partitioned by the table partition key, so the
    plan itself is a metadata-scale job, which is the whole point of a
    compaction planner."""
    li = load_tables(spark, sf_dir)["lineitem"]
    files = (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("part_month"),
            (F.col("l_orderkey") % N_FILE_GROUPS).alias("file_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr(_ROW_BYTES)).alias("bytes"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("part_month")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integer division (DIV / //) on both engines — `/` would be IEEE
    # division with engine-divergent cast-back rounding
    planned = files.withColumn(
        "bytes_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    ).withColumn("bin_id", F.expr(f"bytes_before DIV {TARGET_BYTES}"))
    return (
        planned.groupBy("part_month", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("bytes").alias("bin_bytes"),
            F.sum(
                (F.col("file_id") + 1) * (F.col("bytes") % P)
            ).alias("file_binding"),
        )
        .orderBy("part_month", "bin_id")
    )


INS_MOD, INS_REM = 19, 7  # keys absent from snapshot A ("inserted later")
DEL_MOD, DEL_REM = 17, 3  # keys absent from snapshot B ("deleted")
STA_MOD, STA_REM = 11, 5  # status mutation slice
AMT_MOD, AMT_REM = 13, 2  # amount mutation slice
AMT_DELTA = 999
STA_NEW = "X"


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture table diff: two closed-form snapshots of
    ``orders`` (A = before, B = after inserts/deletes/updates on
    deterministic key slices) compared with ONE full-outer join on the
    key — the added/removed/changed/unchanged ledger every lakehouse
    CDF/audit job produces.  Change detection COMPARES the payloads
    (status, cents); nothing is inferred from the slice definitions.

    Scale: the diff is a single key-equi full-outer join (co-partitioned
    sort-merge at 100 TB — the plan you want, since both snapshots hash
    the same key) followed by a one-row conditional aggregate."""
    o = _orders(spark, sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.expr(_CENTS).alias("cents"),
    )
    snap_a = o.filter(F.col("k") % INS_MOD != INS_REM).select(
        "k", F.col("status").alias("sa"), F.col("cents").alias("ca")
    )
    snap_b = (
        o.filter(F.col("k") % DEL_MOD != DEL_REM)
        .select(
            "k",
            F.when(F.col("k") % STA_MOD == STA_REM, F.lit(STA_NEW))
            .otherwise(F.col("status"))
            .alias("sb"),
            (
                F.col("cents")
                + F.when(
                    F.col("k") % AMT_MOD == AMT_REM, F.lit(AMT_DELTA)
                ).otherwise(F.lit(0))
            ).alias("cb"),
        )
    )
    d = snap_a.join(snap_b, "k", "full_outer")
    added = F.col("sa").isNull() & F.col("sb").isNotNull()
    removed = F.col("sa").isNotNull() & F.col("sb").isNull()
    changed = (
        F.col("sa").isNotNull()
        & F.col("sb").isNotNull()
        & ((F.col("sa") != F.col("sb")) | (F.col("ca") != F.col("cb")))
    )
    unchanged = (
        F.col("sa").isNotNull()
        & F.col("sb").isNotNull()
        & (F.col("sa") == F.col("sb"))
        & (F.col("ca") == F.col("cb"))
    )
    kp = F.col("k") % P
    return d.agg(
        F.sum(added.cast("long")).alias("n_added"),
        F.sum(removed.cast("long")).alias("n_removed"),
        F.sum(changed.cast("long")).alias("n_changed"),
        F.sum(unchanged.cast("long")).alias("n_unchanged"),
        F.sum(F.when(added, kp).otherwise(0)).alias("added_binding"),
        F.sum(F.when(removed, kp).otherwise(0)).alias("removed_binding"),
        F.sum(F.when(changed, kp).otherwise(0)).alias("changed_binding"),
        F.sum(F.when(changed, F.col("cb") - F.col("ca")).otherwise(0)).alias(
            "changed_cents_delta"
        ),
    )


QUERIES = {
    "mv_incremental_orders": mv_incremental_orders,
    "revenue_anomaly_days": revenue_anomaly_days,
    "snapshot_diff_orders": snapshot_diff_orders,
    "compaction_plan": compaction_plan,
}

ORACLES = {
    # inventory fold + greedy in-order pack restated: the running-sum
    # window excludes the current row (bytes BEFORE this file), all
    # arithmetic exact BIGINT
    "compaction_plan": (
        "WITH files AS (SELECT"
        " CAST(date_trunc('month', l_shipdate) AS DATE) AS part_month,"
        f" l_orderkey % {N_FILE_GROUPS} AS file_id,"
        " COUNT(*) AS n_rows,"
        f" CAST(SUM({_ROW_BYTES}) AS BIGINT) AS bytes"
        " FROM lineitem GROUP BY 1, 2),"
        # CAST is load-bearing: DuckDB widens the window SUM over BIGINT
        # to HUGEINT and `//` keeps it, so without the cast bin_id reaches
        # the driver's hasher as int128 and hash-mismatches Spark's BIGINT
        # even though the VALUES are equal (CORRECTNESS_r09's one red row)
        " planned AS (SELECT *,"
        " CAST(COALESCE(SUM(bytes) OVER (PARTITION BY part_month"
        " ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" 1 PRECEDING), 0) // {TARGET_BYTES} AS BIGINT) AS bin_id"
        " FROM files)"
        " SELECT part_month, bin_id, COUNT(*) AS n_files,"
        " CAST(SUM(n_rows) AS BIGINT) AS n_rows,"
        " CAST(SUM(bytes) AS BIGINT) AS bin_bytes,"
        f" CAST(SUM((file_id + 1) * (bytes % {P})) AS BIGINT)"
        " AS file_binding"
        " FROM planned GROUP BY part_month, bin_id"
        " ORDER BY part_month, bin_id"
    ),
    # deliberately NOT the merge: the direct one-pass recompute — the MV
    # refresh algebra (merge of partials) must land on the same cells
    "mv_incremental_orders": (
        "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,"
        " o_orderstatus AS status, COUNT(*) AS n_orders,"
        f" CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents,"
        f" CAST(SUM({_CENTS}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        " AS avg_cents"
        " FROM orders GROUP BY month, status ORDER BY month, status"
    ),
    "revenue_anomaly_days": (
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,"
        f" CAST(SUM({_CENTS}) AS BIGINT) AS x FROM orders GROUP BY day),"
        " m AS (SELECT quantile_cont(x, 0.5) AS med FROM daily),"
        " d2 AS (SELECT day, x, med, abs(x - med) AS dev"
        " FROM daily CROSS JOIN m),"
        " m2 AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d2),"
        " d3 AS (SELECT day, dev, med, mad,"
        " CASE WHEN mad = 0 THEN NULL"
        f" ELSE dev / ({MAD_K} * mad) END AS score"
        " FROM d2 CROSS JOIN m2)"
        " SELECT COUNT(*) AS n_days,"
        f" CAST(SUM(CASE WHEN score > {Z_MAX} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_anomalies,"
        f" CAST(SUM((CASE WHEN score > {Z_MAX} THEN 1 ELSE 0 END)"
        f" * (day - DATE '{EPOCH}')) AS BIGINT) AS day_binding,"
        " MAX(score) AS max_score,"
        " MAX(med) AS median_cents,"
        " MAX(mad) AS mad_cents"
        " FROM d3"
    ),
}

# the same two snapshots restated from the base table and diffed with an
# independent FULL OUTER JOIN — every class count and binding recomputed
ORACLES["snapshot_diff_orders"] = (
    "WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS status,"
    f" {_CENTS} AS cents FROM orders),"
    f" a AS (SELECT k, status AS sa, cents AS ca FROM o"
    f" WHERE k % {INS_MOD} != {INS_REM}),"
    f" b AS (SELECT k,"
    f" CASE WHEN k % {STA_MOD} = {STA_REM} THEN '{STA_NEW}'"
    " ELSE status END AS sb,"
    f" cents + (CASE WHEN k % {AMT_MOD} = {AMT_REM} THEN {AMT_DELTA}"
    " ELSE 0 END) AS cb"
    f" FROM o WHERE k % {DEL_MOD} != {DEL_REM}),"
    " d AS (SELECT COALESCE(a.k, b.k) AS k, sa, ca, sb, cb"
    " FROM a FULL OUTER JOIN b ON a.k = b.k)"
    " SELECT"
    " CAST(SUM(CASE WHEN sa IS NULL AND sb IS NOT NULL THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_added,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NULL THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_removed,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL"
    " AND (sa != sb OR ca != cb) THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_changed,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL"
    " AND sa = sb AND ca = cb THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_unchanged,"
    " CAST(SUM(CASE WHEN sa IS NULL AND sb IS NOT NULL"
    " THEN k % 1000000007 ELSE 0 END) AS BIGINT) AS added_binding,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NULL"
    " THEN k % 1000000007 ELSE 0 END) AS BIGINT) AS removed_binding,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL"
    " AND (sa != sb OR ca != cb) THEN k % 1000000007 ELSE 0 END)"
    " AS BIGINT) AS changed_binding,"
    " CAST(SUM(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL"
    " AND (sa != sb OR ca != cb) THEN cb - ca ELSE 0 END) AS BIGINT)"
    " AS changed_cents_delta"
    " FROM d"
)
