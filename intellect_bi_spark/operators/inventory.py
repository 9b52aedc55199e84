"""Per-row SURVEY.md §2 inventory micro-queries.

One named query per remaining inventory entry (P/A/W/O/F series), so the
coverage checklist is verifiable line by line. Larger composite shapes
(templates, endpoints) live in `sales_queries`; TPC-H-style multi-join
queries in this module demonstrate the join/sort/top-k surface at scale.

All plans are built-in DataFrame ops (whole-stage codegen, no Python in the
hot path); every query has a DuckDB oracle.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables, sales, sales_cte
from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..functions.windows import lag_stitched

_D0 = datetime.date(1996, 1, 1)


# --- P1: project + cast + alias (api/main.py:207-217,504) --------------------


def p1_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(
            (F.col("product") == "Brand#11")
            & (F.col("date") >= F.lit("1996-01-01"))
            & (F.col("date") < F.lit("1996-03-01"))
        )
        .select(
            F.col("date"),
            F.col("product"),
            F.col("sales").cast("double").alias("sales_double"),
            F.col("sales").cast("int").alias("sales_int"),
            F.col("age").cast("double").alias("age_double"),
        )
    )


# --- P2/P3: equality + case-insensitive equality (api/main.py:466,1154) ------


def p2_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(F.col("region") == "North")
        .agg(
            dsum("sales").alias("total_sales"), F.count(F.lit(1)).alias("n")
        )
    )


def p3_ci_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(F.lower(F.col("region")) == "north")
        .agg(
            dsum("sales").alias("total_sales"), F.count(F.lit(1)).alias("n")
        )
    )


# --- P4: numeric range (api/main.py:730,1073) --------------------------------


def p4_age_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .filter(F.col("age") < 30)
        .groupBy("gender")
        .agg(
            dsum("sales").alias("total_sales"), F.count(F.lit(1)).alias("n")
        )
    )


# --- P5: date range with month arithmetic (api/main.py:1155-1163) ------------


def p5_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    start = F.lit(_D0)
    return (
        sales(spark, sf_dir)
        .filter(
            (F.col("date") >= start) & (F.col("date") < F.add_months(start, 3))
        )
        .groupBy(F.date_trunc("month", "date").cast("date").alias("month"))
        .agg(dsum("sales").alias("total_sales"))
    )


# --- P7: NULL handling (api/main.py:355,1042,1115) ---------------------------


def p7_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = sales(spark, sf_dir)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("satisfaction").alias("n_satisfaction"),
        F.sum(
            F.when(F.col("satisfaction").isNull(), 1).otherwise(0)
        ).alias("n_null_satisfaction"),
    )


# --- P8: IN-subquery as semi-join (api/main.py:465,1200) ---------------------


def p8_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    finished = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    return (
        t["lineitem"]
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def p8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN complement (Spark-native extension of P8)."""
    t = load_tables(spark, sf_dir)
    finished = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    return (
        t["lineitem"]
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- A4/A9/A10 ----------------------------------------------------------------


def a4_minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sales(spark, sf_dir).agg(
        F.min("date").alias("min_date"),
        F.max("date").alias("max_date"),
        F.max("sales").alias("max_sale"),
        F.min("sales").alias("min_sale"),
    )


def a9_distinct_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension value dictionary (api/main.py:345-360)."""
    return (
        sales(spark, sf_dir)
        .select("region")
        .where(F.col("region").isNotNull())
        .distinct()
    )


def a10_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .groupBy("product")
        .agg(
            dsum("sales").alias("total_sales"), F.count(F.lit(1)).alias("n")
        )
        .filter(F.col("n") >= 100)
    )


# --- W1: row_number per partition (api/main.py:1040) -------------------------


def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems per returnflag by price; unique (orderkey, linenumber)
    tie-break keeps ranking deterministic across engines."""
    li = load_tables(spark, sf_dir)["lineitem"]
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag", "rn", "l_orderkey", "l_linenumber",
            "l_extendedprice",
        )
    )


def w_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile quartiles per order-status (the window
    surface the reference never used — its drill-down tab stub is the
    natural consumer, SURVEY §2.5). ntile is made deterministic by a
    unique (totalprice DESC, orderkey) ordering; aggregated per
    (status, quartile) so the result is compact at any scale."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return (
        ranked.groupBy("o_orderstatus", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rnk").alias("min_rank"),
            F.max("drnk").alias("max_dense_rank"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("price_total"),
        )
    )


# --- O1/O4: multi-key sort + top-k (TakeOrderedAndProject) --------------------


def o1_topk_multisort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --- F-series scalar function showcase (F1-F11) -------------------------------


def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row scalar-function showcase: date_trunc, extract, epoch seconds,
    interval arithmetic, casts, lower/initcap, round, coalesce, CASE WHEN
    (reference §2.7; initcap emulated in the DuckDB oracle, which lacks it).
    """
    df = sales(spark, sf_dir)
    mx = df.agg(F.max("date").alias("max_date"))
    return mx.select(
        F.col("max_date"),
        F.date_trunc("year", "max_date").cast("date").alias("year_start"),
        F.year("max_date").alias("yr"),
        F.quarter("max_date").alias("qtr"),
        F.unix_timestamp(F.col("max_date").cast("timestamp")).alias(
            "epoch_s"
        ),
        F.add_months("max_date", -3).alias("minus_3m"),
        F.date_add("max_date", 7).alias("plus_7d"),
        F.lower(F.lit("NoRtH")).alias("lowered"),
        F.initcap(F.lit("north")).alias("initcapped"),
        F.round(F.lit(2.718281828), 6).alias("rounded"),
        F.coalesce(F.lit(None).cast("double"), F.lit(1.5)).alias("coalesced"),
        F.when(F.lit(True), "yes").otherwise("no").alias("case_when"),
    )


# --- JSON extraction over events.props (Spark-native extension) --------------


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- Drill-down: cube / rollup (SURVEY §2.4 note: Spark upgrade for the
#     reference's stubbed drill-down tab, ui/app.py:54-56) --------------------


def drilldown_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .cube("region", "gender")
        .agg(
            dsum("sales").alias("total_sales"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
    )


def pivot_region_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (rows → columns): the per-region revenue matrix across
    calendar quarters — the BI cross-tab shape the cube/rollup pair
    above doesn't cover (r8). The pivot VALUES are pinned explicitly:
    Spark then skips the extra distinct-scan job it otherwise runs to
    discover the pivot columns, and the output schema is stable at any
    scale — the production rule for pivoting anything high-cardinality
    (pin the columns or pre-aggregate first). Reference analogue: the
    drill-down tab family (reference ui/app.py:54-56) widened per
    charter."""
    p = (
        sales(spark, sf_dir)
        .withColumn("qtr", F.expr("CONCAT('Q', QUARTER(date))"))
        .groupBy("region")
        .pivot("qtr", ["Q1", "Q2", "Q3", "Q4"])
        .agg(dsum("sales"))
    )
    return p.select(
        "region",
        *[F.col(f"Q{i}").alias(f"q{i}_sales") for i in range(1, 5)],
    ).orderBy("region")


def drilldown_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .rollup("region", "product")
        .agg(
            dsum("sales").alias("total_sales"),
            F.grouping_id().alias("gid"),
        )
    )


# --- Distinct aggregate (Spark-native; no distinct-agg in reference) ----------


def distinct_products_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales(spark, sf_dir)
        .groupBy("region")
        .agg(
            F.countDistinct("product").alias("n_products"),
            F.countDistinct("product", "gender").alias("n_product_gender"),
        )
    )


# --- Set operations (UNION/INTERSECT/EXCEPT — absent in reference, §2.6) -----


def setop_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    parts = [
        t[name].agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for name in ("orders", "lineitem", "customer", "events")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders vs without: INTERSECT / EXCEPT on key sets."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select("c_custkey")
    with_orders = t["orders"].select(
        F.col("o_custkey").alias("c_custkey")
    )
    inter = cust.intersect(with_orders).agg(
        F.lit("with_orders").alias("kind"), F.count(F.lit(1)).alias("n")
    )
    minus = cust.exceptAll(with_orders.distinct()).agg(
        F.lit("without_orders").alias("kind"), F.count(F.lit(1)).alias("n")
    )
    return inter.unionAll(minus)


# --- TPC-H-style multi-join queries (join surface at scale) -------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue top-10 (TPC-H Q3 shape).

    customer side is filtered then joined; Catalyst/AQE picks broadcast for
    the filtered customer set; top-k is TakeOrderedAndProject (no global
    sort)."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-30").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum("l_extendedprice * (1 - l_discount)", 4).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join with same-nation constraint (TPC-H Q5 shape), region=East.

    nation/region broadcast; customer/supplier co-joined on nationkey."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum("l_extendedprice * (1 - l_discount)", 4).alias("revenue")
        )
    )


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar filtered aggregate (TPC-H Q6 shape): fully pushed-down scan."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum("l_extendedprice * l_discount", 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the drill-down P50/P90/P99
    shape). Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    (n−1)·p linear-interpolation definition, so parity is exact. At 100 TB
    you'd swap to ``approx_percentile`` (t-digest, one pass, no global
    sort); this exact variant is the correctness anchor for that."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def salted_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant COUNT(DISTINCT) via two-stage salting: the distinct
    set is partitioned by ``custkey % 16`` (disjoint by construction), each
    salt bucket deduplicates independently, and the per-bucket counts SUM
    to the exact global distinct count.

    Why: a plain COUNT(DISTINCT) on a skewed group key ships every
    distinct value of the hot group through one reducer; salting spreads
    the hot group over 16 reducers and the merge is a tiny integer sum.
    Result is identical — the oracle is the naive one-stage form."""
    o = load_tables(spark, sf_dir)["orders"]
    staged = (
        o.withColumn("salt", F.pmod(F.col("o_custkey"), F.lit(16)))
        .groupBy("o_orderstatus", "salt")
        .agg(F.countDistinct("o_custkey").alias("part"))
    )
    return (
        staged.groupBy("o_orderstatus")
        .agg(F.sum("part").alias("n_customers"))
    )


# --- dedicated micro-queries for §2 rows that previously rode on composites
#     (VERDICT r1 item 2): P6, O2, O3, A12, W3/T4, J2 ------------------------


def p6_inlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: IN-list dimension filter (reference api/main.py:749-757)."""
    return (
        sales(spark, sf_dir)
        .filter(F.col("region").isin("North", "East", "West"))
        .groupBy("region")
        .agg(
            dsum("sales").alias("total_sales"), F.count(F.lit(1)).alias("n")
        )
    )


def o2_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: DESC NULLS LAST ordering (reference api/main.py:1102) — the LAG
    of the first month is genuinely NULL and must sort after every value.

    LAG via the partitioned bucket-and-stitch helper (functions/windows.py)
    — no unpartitioned window even on this bounded per-month frame."""
    monthly = (
        sales(spark, sf_dir)
        .groupBy(F.date_trunc("month", "date").cast("date").alias("month"))
        .agg(dsum("sales").alias("m_sales"))
    )
    return (
        lag_stitched(monthly, "month", "m_sales", "prev_sales")
        .orderBy(F.col("prev_sales").desc_nulls_last(), "month")
        .limit(3)
    )


def o3_top1_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-1 entity by aggregate (reference api/main.py:671-682);
    unique custkey tie-break keeps the LIMIT 1 deterministic."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .orderBy(
            F.desc("n_orders"), F.desc("total_spend"), "o_custkey"
        )
        .limit(1)
    )


def a12_kpi_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: whole-table KPI scalars (reference api/main.py:665-688) over
    the raw fact table — count, exact sum/mean, date bounds."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        davg("l_quantity").alias("avg_quantity"),
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
    )


def w3_rolling_ma7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/T4: 7-row rolling mean over per-status daily totals (reference
    analytics.py:80 MA7). Daily totals aggregate in DECIMAL (exact,
    associative); the window SUM stays decimal and only the final mean is
    one double division — deterministic at any partitioning. The window IS
    partitioned (by status), so no single-reducer bottleneck at scale."""
    o = load_tables(spark, sf_dir)["orders"]
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias(
                "d_total"
            )
        )
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "o_orderstatus",
        "day",
        F.sum("d_total").over(w).alias("ma_sum"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    return win.select(
        "o_orderstatus",
        "day",
        (
            F.expr(
                "CAST(FLOOR(ma_sum) AS DOUBLE)"
                " + CAST(ma_sum - FLOOR(ma_sum) AS DOUBLE)"
            )
            / F.col("n_win")
        ).alias("ma7"),
    )


def j2_bounds_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 1-row bounds frame cross-joined (broadcast) into the fact scan
    (reference api/main.py:1152-1163) — current vs previous month totals
    per returnflag in a single pass over the fact table."""
    li = load_tables(spark, sf_dir)["lineitem"]
    bounds = li.agg(
        F.date_trunc("month", F.max(F.col("l_shipdate").cast("date")))
        .cast("date")
        .alias("cur_m")
    ).withColumn("prev_m", F.add_months("cur_m", -1))
    cur = dsum_sql(
        "CASE WHEN CAST(l_shipdate AS DATE) >= cur_m"
        " THEN l_extendedprice END"
    )
    prev = dsum_sql(
        "CASE WHEN CAST(l_shipdate AS DATE) >= prev_m"
        " AND CAST(l_shipdate AS DATE) < cur_m THEN l_extendedprice END"
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy("l_returnflag")
        .agg(F.expr(cur).alias("cur_total"), F.expr(prev).alias("prev_total"))
    )


QUERIES = {
    "percentiles_by_status": percentiles_by_status,
    "p6_inlist_filter": p6_inlist_filter,
    "o2_nulls_last": o2_nulls_last,
    "o3_top1_subquery": o3_top1_subquery,
    "a12_kpi_scalars": a12_kpi_scalars,
    "w3_rolling_ma7": w3_rolling_ma7,
    "j2_bounds_broadcast": j2_bounds_broadcast,
    "salted_distinct_customers": salted_distinct_customers,
    "p1_project_cast": p1_project_cast,
    "p2_eq_filter": p2_eq_filter,
    "p3_ci_eq_filter": p3_ci_eq_filter,
    "p4_age_range": p4_age_range,
    "p5_date_range": p5_date_range,
    "p7_null_counts": p7_null_counts,
    "p8_semi_join": p8_semi_join,
    "p8_anti_join": p8_anti_join,
    "a4_minmax_dates": a4_minmax_dates,
    "a9_distinct_regions": a9_distinct_regions,
    "a10_having": a10_having,
    "w1_topk_per_group": w1_topk_per_group,
    "w_rank_dense_ntile": w_rank_dense_ntile,
    "o1_topk_multisort": o1_topk_multisort,
    "f_scalar_suite": f_scalar_suite,
    "json_extract_events": json_extract_events,
    "drilldown_cube": drilldown_cube,
    "drilldown_rollup": drilldown_rollup,
    "pivot_region_quarter": pivot_region_quarter,
    "distinct_products_per_region": distinct_products_per_region,
    "setop_union_counts": setop_union_counts,
    "setop_intersect_except": setop_intersect_except,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_revenue_delta": q6_revenue_delta,
}


ORACLES = {
    "p6_inlist_filter": sales_cte(
        f"SELECT region, {dsum_sql('sales')} AS total_sales, COUNT(*) AS n"
        f" FROM sales WHERE region IN ('North', 'East', 'West')"
        f" GROUP BY region"
    ),
    "o2_nulls_last": sales_cte(
        f", m AS (SELECT CAST(date_trunc('month', date) AS DATE) AS month,"
        f" {dsum_sql('sales')} AS m_sales FROM sales GROUP BY 1),"
        f" g AS (SELECT month, m_sales,"
        f" LAG(m_sales) OVER (ORDER BY month) AS prev_sales FROM m)"
        f" SELECT month, m_sales, prev_sales FROM g"
        f" ORDER BY prev_sales DESC NULLS LAST, month LIMIT 3"
    ),
    "o3_top1_subquery": (
        f"SELECT o_custkey, COUNT(*) AS n_orders,"
        f" {dsum_sql('o_totalprice')} AS total_spend FROM orders"
        f" GROUP BY o_custkey"
        f" ORDER BY n_orders DESC, total_spend DESC, o_custkey LIMIT 1"
    ),
    "a12_kpi_scalars": (
        f"SELECT COUNT(*) AS n_rows,"
        f" {dsum_sql('l_extendedprice')} AS total_price,"
        f" {davg_sql('l_quantity')} AS avg_quantity,"
        f" MIN(CAST(l_shipdate AS DATE)) AS first_ship,"
        f" MAX(CAST(l_shipdate AS DATE)) AS last_ship FROM lineitem"
    ),
    "w3_rolling_ma7": (
        "WITH daily AS (SELECT o_orderstatus,"
        " CAST(o_orderdate AS DATE) AS day,"
        " SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS d_total FROM orders"
        " WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'"
        " GROUP BY 1, 2),"
        " win AS (SELECT o_orderstatus, day,"
        " SUM(d_total) OVER w AS ma_sum, COUNT(*) OVER w AS n_win"
        " FROM daily WINDOW w AS (PARTITION BY o_orderstatus ORDER BY day"
        " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))"
        " SELECT o_orderstatus, day,"
        " (CAST(FLOOR(ma_sum) AS DOUBLE)"
        " + CAST(ma_sum - FLOOR(ma_sum) AS DOUBLE)) / n_win AS ma7"
        " FROM win"
    ),
    "j2_bounds_broadcast": (
        "WITH b AS (SELECT CAST(date_trunc('month',"
        " MAX(CAST(l_shipdate AS DATE))) AS DATE) AS cur_m,"
        " CAST(date_trunc('month', MAX(CAST(l_shipdate AS DATE)))"
        " - INTERVAL 1 MONTH AS DATE) AS prev_m FROM lineitem),"
        " j AS (SELECT l.*, b.cur_m, b.prev_m FROM lineitem l, b)"
        " SELECT l_returnflag, "
        + dsum_sql(
            "CASE WHEN CAST(l_shipdate AS DATE) >= cur_m"
            " THEN l_extendedprice END"
        )
        + " AS cur_total, "
        + dsum_sql(
            "CASE WHEN CAST(l_shipdate AS DATE) >= prev_m"
            " AND CAST(l_shipdate AS DATE) < cur_m THEN l_extendedprice END"
        )
        + " AS prev_total FROM j GROUP BY l_returnflag"
    ),
    "salted_distinct_customers": (
        "SELECT o_orderstatus,"
        " COUNT(DISTINCT o_custkey) AS n_customers"
        " FROM orders GROUP BY o_orderstatus"
    ),
    "percentiles_by_status": (
        "SELECT o_orderstatus,"
        " quantile_cont(o_totalprice, 0.5) AS p50,"
        " quantile_cont(o_totalprice, 0.9) AS p90,"
        " quantile_cont(o_totalprice, 0.99) AS p99,"
        " COUNT(*) AS n"
        " FROM orders GROUP BY o_orderstatus"
    ),
    "p1_project_cast": sales_cte(
        # Spark CAST(double AS INT) truncates toward zero; DuckDB rounds —
        # the engine follows Spark semantics, emulated here with trunc().
        "SELECT date, product, CAST(sales AS DOUBLE) AS sales_double,"
        " CAST(trunc(sales) AS INT) AS sales_int,"
        " CAST(age AS DOUBLE) AS age_double"
        " FROM sales WHERE product = 'Brand#11'"
        " AND date >= DATE '1996-01-01' AND date < DATE '1996-03-01'"
    ),
    "p2_eq_filter": sales_cte(
        f"SELECT {dsum_sql('sales')} AS total_sales, COUNT(*) AS n"
        f" FROM sales WHERE region = 'North'"
    ),
    "p3_ci_eq_filter": sales_cte(
        f"SELECT {dsum_sql('sales')} AS total_sales, COUNT(*) AS n"
        f" FROM sales WHERE lower(region) = 'north'"
    ),
    "p4_age_range": sales_cte(
        f"SELECT gender, {dsum_sql('sales')} AS total_sales, COUNT(*) AS n"
        f" FROM sales WHERE age < 30 GROUP BY gender"
    ),
    "p5_date_range": sales_cte(
        f"SELECT CAST(date_trunc('month', date) AS DATE) AS month,"
        f" {dsum_sql('sales')} AS total_sales FROM sales"
        f" WHERE date >= DATE '1996-01-01'"
        f" AND date < CAST(DATE '1996-01-01' + INTERVAL 3 MONTH AS DATE)"
        f" GROUP BY 1"
    ),
    "p7_null_counts": sales_cte(
        "SELECT COUNT(*) AS n_rows, COUNT(satisfaction) AS n_satisfaction,"
        " CAST(SUM(CASE WHEN satisfaction IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_null_satisfaction FROM sales"
    ),
    "p8_semi_join": (
        f"SELECT l_returnflag, {dsum_sql('l_extendedprice')} AS total_price,"
        f" COUNT(*) AS n FROM lineitem WHERE l_orderkey IN"
        f" (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"
        f" GROUP BY l_returnflag"
    ),
    "p8_anti_join": (
        f"SELECT l_returnflag, {dsum_sql('l_extendedprice')} AS total_price,"
        f" COUNT(*) AS n FROM lineitem WHERE l_orderkey NOT IN"
        f" (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"
        f" GROUP BY l_returnflag"
    ),
    "a4_minmax_dates": sales_cte(
        "SELECT MIN(date) AS min_date, MAX(date) AS max_date,"
        " MAX(sales) AS max_sale, MIN(sales) AS min_sale FROM sales"
    ),
    "a9_distinct_regions": sales_cte(
        "SELECT DISTINCT region FROM sales WHERE region IS NOT NULL"
    ),
    "a10_having": sales_cte(
        f"SELECT product, {dsum_sql('sales')} AS total_sales, COUNT(*) AS n"
        f" FROM sales GROUP BY product HAVING COUNT(*) >= 100"
    ),
    "w1_topk_per_group": (
        "WITH ranked AS (SELECT l_returnflag,"
        " ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY"
        " l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,"
        " l_orderkey, l_linenumber, l_extendedprice FROM lineitem)"
        " SELECT l_returnflag, CAST(rn AS INT) AS rn, l_orderkey,"
        " l_linenumber, l_extendedprice FROM ranked WHERE rn <= 3"
    ),
    "o1_topk_multisort": (
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"
        " ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"
    ),
    "w_rank_dense_ntile": (
        "WITH ranked AS (SELECT o_orderstatus, o_totalprice,"
        " RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,"
        " NTILE(4) OVER w AS quartile FROM orders"
        " WINDOW w AS (PARTITION BY o_orderstatus"
        " ORDER BY o_totalprice DESC, o_orderkey))"
        " SELECT o_orderstatus, CAST(quartile AS INT) AS quartile,"
        " COUNT(*) AS n, CAST(MIN(rnk) AS INT) AS min_rank,"
        " CAST(MAX(drnk) AS INT) AS max_dense_rank,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)"
        " AS price_total"
        " FROM ranked GROUP BY o_orderstatus, quartile"
    ),
    "f_scalar_suite": sales_cte(
        ", mx AS (SELECT MAX(date) AS max_date FROM sales)"
        " SELECT max_date,"
        " CAST(date_trunc('year', max_date) AS DATE) AS year_start,"
        " CAST(EXTRACT(YEAR FROM max_date) AS INT) AS yr,"
        " CAST(EXTRACT(QUARTER FROM max_date) AS INT) AS qtr,"
        " CAST(epoch(CAST(max_date AS TIMESTAMP)) AS BIGINT) AS epoch_s,"
        " CAST(max_date - INTERVAL 3 MONTH AS DATE) AS minus_3m,"
        " CAST(max_date + INTERVAL 7 DAY AS DATE) AS plus_7d,"
        " lower('NoRtH') AS lowered,"
        " upper(substr('north', 1, 1)) || lower(substr('north', 2))"
        " AS initcapped,"
        " round(CAST(2.718281828 AS DOUBLE), 6) AS rounded,"
        " coalesce(CAST(NULL AS DOUBLE), 1.5) AS coalesced,"
        " CASE WHEN TRUE THEN 'yes' ELSE 'no' END AS case_when"
        " FROM mx"
    ),
    "json_extract_events": (
        "SELECT event_type,"
        " CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)"
        " AS sum_k,"
        " COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,"
        " COUNT(*) AS n FROM events GROUP BY event_type"
    ),
    # pivot = conditional aggregation per pinned quarter column
    "pivot_region_quarter": sales_cte(
        "SELECT region, "
        + dsum_sql("CASE WHEN quarter(date) = 1 THEN sales END")
        + " AS q1_sales, "
        + dsum_sql("CASE WHEN quarter(date) = 2 THEN sales END")
        + " AS q2_sales, "
        + dsum_sql("CASE WHEN quarter(date) = 3 THEN sales END")
        + " AS q3_sales, "
        + dsum_sql("CASE WHEN quarter(date) = 4 THEN sales END")
        + " AS q4_sales"
        + " FROM sales GROUP BY region ORDER BY region"
    ),
    "drilldown_cube": sales_cte(
        f"SELECT region, gender, {dsum_sql('sales')} AS total_sales,"
        f" COUNT(*) AS n, CAST(GROUPING(region, gender) AS BIGINT) AS gid"
        f" FROM sales GROUP BY CUBE(region, gender)"
    ),
    "drilldown_rollup": sales_cte(
        f"SELECT region, product, {dsum_sql('sales')} AS total_sales,"
        f" CAST(GROUPING(region, product) AS BIGINT) AS gid"
        f" FROM sales GROUP BY ROLLUP(region, product)"
    ),
    "distinct_products_per_region": sales_cte(
        "SELECT region, COUNT(DISTINCT product) AS n_products,"
        " COUNT(DISTINCT (product, gender)) AS n_product_gender"
        " FROM sales GROUP BY region"
    ),
    "setop_union_counts": (
        "SELECT 'orders' AS table_name, COUNT(*) AS n_rows FROM orders"
        " UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem"
        " UNION ALL SELECT 'customer', COUNT(*) FROM customer"
        " UNION ALL SELECT 'events', COUNT(*) FROM events"
    ),
    "setop_intersect_except": (
        "SELECT 'with_orders' AS kind, COUNT(*) AS n FROM"
        " (SELECT c_custkey FROM customer INTERSECT"
        "  SELECT o_custkey FROM orders)"
        " UNION ALL"
        " SELECT 'without_orders', COUNT(*) FROM"
        " (SELECT c_custkey FROM customer EXCEPT ALL"
        "  SELECT DISTINCT o_custkey FROM orders)"
    ),
    "q3_shipping_priority": (
        f"SELECT l_orderkey, o_orderdate, o_orderpriority,"
        f" {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue"
        f" FROM customer JOIN orders ON c_custkey = o_custkey"
        f" JOIN lineitem ON o_orderkey = l_orderkey"
        f" WHERE c_mktsegment = 'BUILDING'"
        f" AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'"
        f" AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'"
        f" GROUP BY l_orderkey, o_orderdate, o_orderpriority"
        f" ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
    "q5_local_supplier_volume": (
        f"SELECT n_name AS nation_name,"
        f" {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue"
        f" FROM customer JOIN orders ON c_custkey = o_custkey"
        f" JOIN lineitem ON o_orderkey = l_orderkey"
        f" JOIN supplier ON l_suppkey = s_suppkey"
        f" AND c_nationkey = s_nationkey"
        f" JOIN nation ON s_nationkey = n_nationkey"
        f" JOIN region ON n_regionkey = r_regionkey"
        f" WHERE r_name = 'ASIA' GROUP BY n_name"
    ),
    "q6_revenue_delta": (
        f"SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,"
        f" COUNT(*) AS n FROM lineitem"
        f" WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
        f" AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        f" AND l_discount BETWEEN 0.05 AND 0.07"
        f" AND l_quantity < 24"
    ),
}
