"""The reference engine's concrete analytics queries, Spark-first.

Every query the reference can answer over its ``sales`` fact table —
six BI/KPI endpoints (reference api/main.py:633-767,843-859), six template
handlers (api/main.py:1026-1208), and the intent-compiler shapes
(api/main.py:425-532) — re-expressed as declarative DataFrame plans over the
derived ``sales`` view (see `..catalog`). Each has a DuckDB oracle.

Scale design notes:
- All aggregations are hash-aggregates with map-side partials (Catalyst
  does partial+final automatically); group keys are low-cardinality
  (region/product/month/quarter), so the final shuffle is tiny regardless
  of fact-table size.
- The quarter-boundary queries (J2 shapes) broadcast a 1-row bounds frame
  instead of re-scanning, so they stay single-pass over the fact table.
- Top-k uses orderBy+limit → Catalyst `TakeOrderedAndProject` (per-partition
  top-k, no global sort).
- Numeric parity + run-to-run determinism via exact decimal moments
  (`..functions.numeric`).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import sales, sales_cte
from ..functions.windows import lag_stitched
from ..functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    grouped_exact,
    slope_exact,
    slope_sql,
    corr_exact,
    corr_sql,
)

_EPOCH = datetime.date(1970, 1, 1)


def _month(col: str = "date") -> Column:
    return F.date_trunc("month", F.col(col)).cast("date")


def _quarter(col: str = "date") -> Column:
    return F.date_trunc("quarter", F.col(col)).cast("date")


# --- /analytics/kpi (reference api/main.py:665-688) --------------------------


def kpi_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table KPI scalars (A12): total sales, avg satisfaction, rows.
    First-moment sums ride the long-partial fast path
    (numeric.grouped_exact) — bit-identical to the decimal sums."""
    g = grouped_exact(
        sales(spark, sf_dir),
        [],
        [
            ("sum", "sales", 2, "total_sales"),
            ("sum", "satisfaction", 2, "_sum_sat"),
            ("count", "satisfaction", None, "_n_sat"),
            ("countstar", None, None, "n_rows"),
        ],
    )
    return g.select(
        "total_sales",
        (F.col("_sum_sat") / F.col("_n_sat")).alias("avg_satisfaction"),
        "n_rows",
    )


def top_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 region by total sales (O3, api/main.py:671-676)."""
    return (
        sales(spark, sf_dir)
        .groupBy("region")
        .agg(dsum("sales").alias("total_sales"))
        .orderBy(F.desc("total_sales"), "region")
        .limit(1)
    )


def top_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 product by total sales (O3, api/main.py:677-682)."""
    return (
        sales(spark, sf_dir)
        .groupBy("product")
        .agg(dsum("sales").alias("total_sales"))
        .orderBy(F.desc("total_sales"), "product")
        .limit(1)
    )


# --- /bi/top-products-under-30 (api/main.py:721-741): P4+A1+A3+A7+O4 ---------


def top_products_under_30(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(F.col("age") < 30)
        .groupBy("product")
        .agg(
            dsum("sales").alias("total_sales"),
            F.count(F.lit(1)).alias("n_transactions"),
        )
        .orderBy(F.desc("total_sales"), "product")
        .limit(2)
    )


# --- /bi/region-trends (api/main.py:743-767): P6+A8+A11+F1 -------------------


def region_trends_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = grouped_exact(
        sales(spark, sf_dir)
        .filter(F.col("region").isin("North", "South"))
        .select(_month().alias("month"), "region", "sales", "satisfaction"),
        ["month", "region"],
        [
            ("sum", "sales", 2, "total_sales"),
            ("sum", "satisfaction", 2, "_sum_sat"),
            ("count", "satisfaction", None, "_n_sat"),
        ],
    )
    return g.select(
        "month",
        "region",
        "total_sales",
        (F.col("_sum_sat") / F.col("_n_sat")).alias("avg_satisfaction"),
    )


# --- MoM max-growth month (template C7#3, api/main.py:1087-1105): W2+O2 ------


def mom_growth_top_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        sales(spark, sf_dir)
        .groupBy(_month().alias("month"))
        .agg(dsum("sales").alias("m_sales"))
    )
    return (
        lag_stitched(monthly, "month", "m_sales", "prev_m_sales")
        .withColumn("mom_growth", F.col("m_sales") - F.col("prev_m_sales"))
        .drop("prev_m_sales")
        .orderBy(F.col("mom_growth").desc_nulls_last(), "month")
        .limit(1)
    )


# --- YoY by quarter (intent template C6, api/main.py:501-530): J1 ------------


def yoy_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = (
        sales(spark, sf_dir)
        .groupBy(
            F.year("date").alias("year"), F.quarter("date").alias("quarter")
        )
        .agg(dsum("sales").alias("total_sales"))
    )
    a, b = q.alias("a"), q.alias("b")
    return a.join(
        b,
        (F.col("b.quarter") == F.col("a.quarter"))
        & (F.col("b.year") == F.col("a.year") - 1),
        "left",
    ).select(
        F.col("a.year").alias("year"),
        F.col("a.quarter").alias("quarter"),
        F.col("a.total_sales").alias("total_sales"),
        F.col("b.total_sales").alias("prev_year_sales"),
        (F.col("a.total_sales") - F.col("b.total_sales")).alias("yoy_delta"),
    )


# --- /bi/region-divergence (api/main.py:691-719): A6+A10+W1 ------------------


def region_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regions where sales trend up while satisfaction trends down.

    x = days since 1970-01-01 (the reference uses epoch seconds,
    api/main.py:698 — slope scales by 86400 but sign/semantics match and
    duplicate-x rows are handled order-independently, unlike the
    ROW_NUMBER variant at api/main.py:1040 which is nondeterministic
    under date ties).
    """
    df = sales(spark, sf_dir).withColumn(
        "t", F.datediff(F.col("date"), F.lit(_EPOCH)).cast("double")
    )
    return (
        df.groupBy("region")
        .agg(
            slope_exact("t", "sales").alias("slope_sales"),
            slope_exact("t", "satisfaction").alias("slope_satisfaction"),
        )
        .filter(
            (F.col("slope_sales") > 0) & (F.col("slope_satisfaction") < 0)
        )
        .orderBy(F.desc("slope_sales"), "region")
        .limit(10)
    )


# --- correlation intent (api/main.py:444-449): A5 ----------------------------


def corr_sales_satisfaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sales(spark, sf_dir).agg(
        corr_exact("sales", "satisfaction").alias("corr_sales_satisfaction")
    )


# --- /ts/sales-daily (api/main.py:843-859): A8 day grain ---------------------


def sales_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grouped_exact(
        sales(spark, sf_dir).select("date", "sales"),
        ["date"],
        [("sum", "sales", 2, "daily_sales")],
    )


# --- last-2-quarters satisfaction (api/main.py:452-459,1175-1208): O5+P8 -----


def last_two_quarters_satisfaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = sales(spark, sf_dir).withColumn("qtr", _quarter())
    last2 = qdf.select("qtr").distinct().orderBy(F.desc("qtr")).limit(2)
    return (
        qdf.join(F.broadcast(last2), "qtr", "left_semi")
        .groupBy("qtr")
        .agg(
            davg("satisfaction").alias("avg_satisfaction"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- QoQ delta (intent template, api/main.py:461-496): J3 as window lag ------


def qoq_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = (
        sales(spark, sf_dir)
        .groupBy(_quarter().alias("qtr"))
        .agg(dsum("sales").alias("total_sales"))
    )
    return (
        lag_stitched(q, "qtr", "total_sales", "prev_total")
        .orderBy(F.desc("qtr"))
        .limit(1)
        .withColumn("qoq_delta", F.col("total_sales") - F.col("prev_total"))
    )


# --- gender × satisfaction (template C7#4, api/main.py:1109-1116): P7 --------


def gender_satisfaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(F.col("satisfaction").isNotNull() & F.col("gender").isNotNull())
        .groupBy("gender")
        .agg(
            davg("satisfaction").alias("avg_satisfaction"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- region quarter delta (template C7#5, api/main.py:1141-1173): J2 ---------


def region_quarter_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region avg satisfaction, current vs previous quarter.

    The reference cross-joins a 1-row quarter-boundary CTE
    (api/main.py:1152-1163); here the bounds frame is computed once and
    broadcast — a single pass over the fact table at any scale.

    The bounds pass reads ``max(l_shipdate)`` straight off the fact table
    instead of through the star join: MAX is duplicate-insensitive and the
    dimension joins drop no lineitem rows under referential integrity, so
    the answer is identical — but the probe is a parquet-footer-stats read
    (no join, no full scan), which matters when the fact table is 100 TB.
    """
    df = sales(spark, sf_dir)
    from ..catalog import load_tables

    fact = load_tables(spark, sf_dir)["lineitem"]
    bounds = fact.agg(
        F.date_trunc("quarter", F.max(F.col("l_shipdate").cast("date")))
        .cast("date")
        .alias("cur_q")
    ).withColumn("prev_q", F.add_months("cur_q", -3))
    cur = davg_sql("CASE WHEN date >= cur_q THEN satisfaction END")
    prev = davg_sql(
        "CASE WHEN date >= prev_q AND date < cur_q THEN satisfaction END"
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .groupBy("region")
        .agg(F.expr(cur).alias("cur_avg"), F.expr(prev).alias("prev_avg"))
        .withColumn("delta", F.col("cur_avg") - F.col("prev_avg"))
    )


# --- per-region sales Gini (A+ concentration metric; §2.12 UDAF seam) --------


def region_sales_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region Gini coefficient of transaction sales — the inequality/
    concentration metric a spend-distribution dashboard wants, and the
    shape Spark has no built-in aggregate for.

    Scale path (this registry query): the rank-sum identity
    ``G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)`` over integer cents,
    computed WITHOUT ranking individual rows. A per-row ``row_number``
    window would sort the whole fact through one task per region — the
    single-task funnel this codebase bans. Instead rows first collapse
    to the DISTINCT-VALUE relation (``groupBy(region, cents)`` — a
    parallel hash aggregate; cardinality is bounded by the price grid,
    not the row count), and each value block's rank sum comes from the
    closed form ``cnt·cum_before + cnt(cnt+1)/2`` with ``cum_before`` a
    running count over the small distinct-value relation. Ties in x
    contribute the same rank·x total under ANY tie order, so this equals
    the row-ranked form exactly — the oracle states the literal
    row_number version and parity proves the identity. All Σ run as
    DECIMAL(38,0) over exact integers ⇒ engine-identical at any
    partitioning and any data size. The pandas-UDAF twin
    (:func:`_gini_udaf`) is the §2.12 grouped-agg extension seam, proven
    equal in tests/test_numeric.py."""
    return gini_by_group(sales(spark, sf_dir), "region", "sales")


# value-bucket width (cents) for the two-level Gini rank sum: fixed by the
# money DOMAIN (price grid span), not the row count, so bucket cardinality
# stays a few hundred-to-thousand at any data size while per-bucket work
# scales out. 2^14 cents = $163.84 per bucket.
_GINI_BKT = 1 << 14


def gini_by_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Distributed per-group Gini over integer cents; the engine core behind
    :func:`region_sales_gini` (see its docstring for the rank-sum identity
    and scale argument). Returns ``(key, n, gini)``; NULL values are ignored
    (a group with no non-null values disappears — the grain is non-null
    transactions) and a group whose cent-sum is 0 (sum-cancelling signed
    values, or all zeros) gets a NULL gini — agreed with the UDAF twin and
    covered by tests/test_numeric.py edge cases.

    TWO-LEVEL rank sum (r7): real money values are near-unique (596,599
    distinct cents in 600 k sf0.1 rows), so a per-group cumulative window
    over the distinct-value relation degenerates to one task per group —
    the serial funnel this codebase bans. Instead values bucket by a
    domain-fixed cent range (:data:`_GINI_BKT`): the cumulative rank work
    runs in a (group, bucket)-partitioned window — groups × buckets
    parallel tasks — and only the per-BUCKET summary (a few hundred rows
    per group) passes through the per-group prefix window. Exact
    regrouping of the same integer sums: for a value block with global
    cum-before CUM = cum_bkt + local_cum,
    ``Σ c·cnt·(2·CUM + cnt + 1) = Σ_bkt [local_part + 2·cum_bkt·bsum]``
    with every Σ in DECIMAL(38,0) — bit-identical to the single-window
    form at any partitioning."""
    cents = F.expr(f"CAST(ROUND({value} * 100) AS BIGINT)")
    by_val = (
        # NULL values contribute nothing to a Gini, and unfiltered they would
        # diverge from the oracle: Spark's window ORDER BY sorts NULL first
        # (shifting every real value's cum_before) while DuckDB's ROW_NUMBER
        # sorts NULL last. The current sales view cannot produce NULLs, but
        # the function should not depend on that unstated contract.
        df.filter(F.col(value).isNotNull())
        .select(key, cents.alias("c"))
        .groupBy(key, "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            # floor division keeps negative cents ordered correctly
            # (Spark DIV truncates toward zero; FLOOR(c / B) does not)
            "bkt",
            F.expr(f"CAST(FLOOR(c / {_GINI_BKT}) AS BIGINT)"),
        )
    )
    w_local = (
        Window.partitionBy(key, "bkt")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vals = by_val.withColumn(
        "local_cum", F.coalesce(F.sum("cnt").over(w_local), F.lit(0))
    )
    per_bkt = vals.groupBy(key, "bkt").agg(
        F.sum("cnt").alias("bcnt"),
        F.sum(
            F.expr("CAST(c AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))")
        ).alias("bsum"),
        # local doubled rank-sum: pure decimal multiplies (the /2 form
        # paid a BigDecimal division per distinct value — measured
        # ~0.4 s per 600 k values in r6)
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(38,0)) * (CAST(cnt AS DECIMAL(38,0))"
                " * (2 * CAST(local_cum AS DECIMAL(38,0))"
                " + CAST(cnt AS DECIMAL(38,0)) + 1))"
            )
        ).alias("blocal2"),
    )
    w_bkt = (
        Window.partitionBy(key)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bkts = per_bkt.withColumn(
        "cum_bkt", F.coalesce(F.sum("bcnt").over(w_bkt), F.lit(0))
    )
    g = bkts.groupBy(key).agg(
        F.sum("bcnt").alias("n"),
        F.sum("bsum").alias("s"),
        F.sum(
            F.expr(
                "blocal2 + 2 * CAST(cum_bkt AS DECIMAL(38,0)) * bsum"
            )
        ).alias("sr2"),
    )
    return g.select(
        key,
        "n",
        # explicit NULL on the s=0 edge (empty group or sum-cancelling signed
        # values): a Gini is undefined when total spend is zero, and the
        # guard keeps this form and the UDAF twin in agreement instead of
        # leaving the edge to engine division-by-zero semantics
        F.when(
            (F.col("n") == 0) | (F.col("s") == 0), F.lit(None).cast("double")
        )
        .otherwise(
            (F.col("sr2") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double")
        )
        .alias("gini"),
    ).orderBy(key)


def _gini_udaf():
    """§2.12 grouped-agg pandas UDAF seam: the same Gini as
    :func:`region_sales_gini`, one Arrow batch per group. Demonstrates
    the ``groupBy(...).agg(pandas_udf)`` extension point for aggregates
    Spark lacks; the integer accumulation mirrors the distributed form
    exactly while n²·max_cents < 2⁶³ (~10⁶ rows/group at 10⁵-unit sales
    — a per-group bound, so use the window form for bigger groups)."""
    import numpy as np

    # explicit functionType: the module's deferred annotations (PEP 563)
    # can't resolve a locally-imported pd.Series hint
    @F.pandas_udf("double", F.PandasUDFType.GROUPED_AGG)
    def gini_cents(v):
        vals = v.to_numpy()
        vals = vals[~np.isnan(vals)]
        c = np.sort(np.round(vals * 100).astype(np.int64))
        n = c.size
        s = int(c.sum())
        if n == 0 or s == 0:
            # undefined, same contract as the distributed form's NULL guard
            return None
        sr = int((np.arange(1, n + 1, dtype=np.int64) * c).sum())
        return float(2 * sr - (n + 1) * s) / float(n * s)

    return gini_cents


QUERIES = {
    "region_sales_gini": region_sales_gini,
    "kpi_overview": kpi_overview,
    "top_region": top_region,
    "top_product": top_product,
    "top_products_under_30": top_products_under_30,
    "region_trends_monthly": region_trends_monthly,
    "mom_growth_top_month": mom_growth_top_month,
    "yoy_quarter": yoy_quarter,
    "region_divergence": region_divergence,
    "corr_sales_satisfaction": corr_sales_satisfaction,
    "sales_daily": sales_daily,
    "last_two_quarters_satisfaction": last_two_quarters_satisfaction,
    "qoq_delta": qoq_delta,
    "gender_satisfaction": gender_satisfaction,
    "region_quarter_delta": region_quarter_delta,
}


ORACLES = {
    "region_sales_gini": sales_cte(
        ", cents AS (SELECT region,"
        " CAST(ROUND(sales * 100) AS BIGINT) AS c FROM sales),"
        " ranked AS (SELECT region, c, ROW_NUMBER() OVER"
        " (PARTITION BY region ORDER BY c) AS rn FROM cents),"
        " g AS (SELECT region, COUNT(*) AS n,"
        " SUM(CAST(c AS DECIMAL(38,0))) AS s,"
        " SUM(CAST(rn AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sr"
        " FROM ranked GROUP BY region)"
        " SELECT region, n,"
        " CAST(2 * sr - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE)"
        " AS gini FROM g ORDER BY region"
    ),
    "kpi_overview": sales_cte(
        f"SELECT {dsum_sql('sales')} AS total_sales,"
        f" {davg_sql('satisfaction')} AS avg_satisfaction,"
        f" COUNT(*) AS n_rows FROM sales"
    ),
    "top_region": sales_cte(
        f"SELECT region, {dsum_sql('sales')} AS total_sales FROM sales"
        f" GROUP BY region ORDER BY total_sales DESC, region LIMIT 1"
    ),
    "top_product": sales_cte(
        f"SELECT product, {dsum_sql('sales')} AS total_sales FROM sales"
        f" GROUP BY product ORDER BY total_sales DESC, product LIMIT 1"
    ),
    "top_products_under_30": sales_cte(
        f"SELECT product, {dsum_sql('sales')} AS total_sales,"
        f" COUNT(*) AS n_transactions FROM sales WHERE age < 30"
        f" GROUP BY product ORDER BY total_sales DESC, product LIMIT 2"
    ),
    "region_trends_monthly": sales_cte(
        f"SELECT CAST(date_trunc('month', date) AS DATE) AS month, region,"
        f" {dsum_sql('sales')} AS total_sales,"
        f" {davg_sql('satisfaction')} AS avg_satisfaction"
        f" FROM sales WHERE region IN ('North', 'South')"
        f" GROUP BY CAST(date_trunc('month', date) AS DATE), region"
    ),
    "mom_growth_top_month": sales_cte(
        f", m AS (SELECT CAST(date_trunc('month', date) AS DATE) AS month,"
        f" {dsum_sql('sales')} AS m_sales FROM sales"
        f" GROUP BY CAST(date_trunc('month', date) AS DATE)),"
        f" g AS (SELECT month, m_sales,"
        f" m_sales - LAG(m_sales) OVER (ORDER BY month) AS mom_growth FROM m)"
        f" SELECT month, m_sales, mom_growth FROM g"
        f" ORDER BY mom_growth DESC NULLS LAST, month LIMIT 1"
    ),
    "yoy_quarter": sales_cte(
        f", q AS (SELECT CAST(EXTRACT(YEAR FROM date) AS INT) AS year,"
        f" CAST(EXTRACT(QUARTER FROM date) AS INT) AS quarter,"
        f" {dsum_sql('sales')} AS total_sales FROM sales GROUP BY 1, 2)"
        f" SELECT a.year, a.quarter, a.total_sales,"
        f" b.total_sales AS prev_year_sales,"
        f" a.total_sales - b.total_sales AS yoy_delta"
        f" FROM q a LEFT JOIN q b"
        f" ON b.quarter = a.quarter AND b.year = a.year - 1"
    ),
    "region_divergence": sales_cte(
        f", s AS (SELECT region,"
        f" CAST(date_diff('day', DATE '1970-01-01', date) AS DOUBLE) AS t,"
        f" sales, satisfaction FROM sales)"
        f" SELECT region, {slope_sql('t', 'sales')} AS slope_sales,"
        f" {slope_sql('t', 'satisfaction')} AS slope_satisfaction"
        f" FROM s GROUP BY region"
        f" HAVING slope_sales > 0 AND slope_satisfaction < 0"
        f" ORDER BY slope_sales DESC, region LIMIT 10"
    ),
    "corr_sales_satisfaction": sales_cte(
        f"SELECT {corr_sql('sales', 'satisfaction')}"
        f" AS corr_sales_satisfaction FROM sales"
    ),
    "sales_daily": sales_cte(
        f"SELECT date, {dsum_sql('sales')} AS daily_sales FROM sales"
        f" GROUP BY date"
    ),
    "last_two_quarters_satisfaction": sales_cte(
        f", q AS (SELECT CAST(date_trunc('quarter', date) AS DATE) AS qtr,"
        f" satisfaction FROM sales),"
        f" last2 AS (SELECT DISTINCT qtr FROM q ORDER BY qtr DESC LIMIT 2)"
        f" SELECT qtr, {davg_sql('satisfaction')} AS avg_satisfaction,"
        f" COUNT(*) AS n_rows FROM q"
        f" WHERE qtr IN (SELECT qtr FROM last2) GROUP BY qtr"
    ),
    "qoq_delta": sales_cte(
        f", q AS (SELECT CAST(date_trunc('quarter', date) AS DATE) AS qtr,"
        f" {dsum_sql('sales')} AS total_sales FROM sales GROUP BY 1),"
        f" g AS (SELECT qtr, total_sales,"
        f" LAG(total_sales) OVER (ORDER BY qtr) AS prev_total FROM q)"
        f" SELECT qtr, total_sales, prev_total,"
        f" total_sales - prev_total AS qoq_delta FROM g"
        f" ORDER BY qtr DESC LIMIT 1"
    ),
    "gender_satisfaction": sales_cte(
        f"SELECT gender, {davg_sql('satisfaction')} AS avg_satisfaction,"
        f" COUNT(*) AS n_rows FROM sales"
        f" WHERE satisfaction IS NOT NULL AND gender IS NOT NULL"
        f" GROUP BY gender"
    ),
    "region_quarter_delta": sales_cte(
        f", b AS (SELECT CAST(date_trunc('quarter', MAX(date)) AS DATE) AS cur_q,"
        f" CAST(CAST(date_trunc('quarter', MAX(date)) AS DATE)"
        f" - INTERVAL 3 MONTH AS DATE) AS prev_q FROM sales),"
        f" j AS (SELECT s.*, b.cur_q, b.prev_q FROM sales s, b),"
        f" a AS (SELECT region,"
        f" {davg_sql('CASE WHEN date >= cur_q THEN satisfaction END')} AS cur_avg,"
        f" {davg_sql('CASE WHEN date >= prev_q AND date < cur_q THEN satisfaction END')} AS prev_avg"
        f" FROM j GROUP BY region)"
        f" SELECT region, cur_avg, prev_avg, cur_avg - prev_avg AS delta FROM a"
    ),
}
