"""Measure the stitched-window fixed-overhead floor (VERDICT r5 item 2).

Decomposes the stitched-vs-plain-window gap for the two `weak`-graded call
sites (``mom_growth_top_month``'s LAG, ``events_rolling_7d``'s rolling
frame) into:

- plan construction (Py4J round-trips + Catalyst analysis/optimization),
  measured by forcing ``queryExecution().executedPlan()`` with no job;
- pure machinery (persist fill + extra AQE stage scheduling + broadcast
  build), measured by running the SAME stitched helper on a LITERAL
  in-memory frame of the same cardinality — no file scan, no upstream
  aggregation, microseconds of real row work;
- scale response: the gap at sf0.001 / sf0.01 / sf0.1. A fixed floor shows
  as a CONSTANT gap while the shared upstream (fact scan + aggregate)
  grows with data.

Run: ``python tools/stitch_floor.py`` (writes a table to stdout and
``STITCH_FLOOR.json``).
"""
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window, functions as F  # noqa: E402

from intellect_bi_spark.session import get_spark  # noqa: E402
from intellect_bi_spark.catalog import sales  # noqa: E402
from intellect_bi_spark.functions import windows as W  # noqa: E402
from intellect_bi_spark.functions.numeric import dsum, dsum_sql  # noqa: E402
from intellect_bi_spark.functions.windows import (  # noqa: E402
    lag_stitched,
    rolling_stitched,
)
from intellect_bi_spark.operators.relational import load_tables  # noqa: E402
from intellect_bi_spark.operators.sales_queries import _month  # noqa: E402

spark = get_spark()
REPS = 9
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def med(fn):
    ts = []
    for _ in range(REPS):
        W.reset_caches()
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2] * 1000, 1)


def monthly(sf):
    return (
        sales(spark, sf)
        .groupBy(_month().alias("month"))
        .agg(dsum("sales").alias("m_sales"))
    )


def daily(sf):
    ev = load_tables(spark, sf)["events"]
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.expr(dsum_sql("value")).alias("daily_value"))


def lit_monthly(n=36):
    d0 = datetime.date(2021, 1, 1)
    rows = [
        (datetime.date(2021 + m // 12, m % 12 + 1, 1), float(m))
        for m in range(n)
    ]
    return spark.createDataFrame(rows, "month date, m_sales double")


def lit_daily(n=365):
    d0 = datetime.date(2023, 6, 1)
    rows = [(d0 + datetime.timedelta(days=i), float(i)) for i in range(n)]
    return spark.createDataFrame(rows, "day date, daily_value double")


def lag_run(df_fn, mat=True):
    def f():
        lag_stitched(df_fn(), "month", "m_sales", "p", materialize=mat).collect()
    return f


def lag_plain(df_fn):
    def f():
        df_fn().withColumn(
            "p", F.lag("m_sales").over(Window.orderBy("month"))
        ).collect()
    return f


def roll_run(df_fn, mat=True):
    def f():
        rolling_stitched(
            df_fn(), "day", F.col("daily_value").cast("decimal(38,2)"),
            6, "s", "c", materialize=mat,
        ).collect()
    return f


def roll_plain(df_fn):
    def f():
        w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
        df_fn().withColumn(
            "s", F.sum(F.col("daily_value").cast("decimal(38,2)")).over(w)
        ).collect()
    return f


def plan_only(build):
    def f():
        build()._jdf.queryExecution().executedPlan()
    return f


# warmup
for sf in SFS:
    sales(spark, sf).count()
    load_tables(spark, sf)["events"].count()
lag_run(lambda: monthly(SFS[-1]))()
roll_run(lambda: daily(SFS[-1]))()
lag_run(lit_monthly)()
roll_run(lit_daily)()

out = {"reps": REPS}

# 1) literal-frame machinery floor (no source data at all)
out["lag_literal_stitched_ms"] = med(lag_run(lit_monthly))
out["lag_literal_plain_ms"] = med(lag_plain(lit_monthly))
out["roll_literal_stitched_ms"] = med(roll_run(lit_daily))
out["roll_literal_plain_ms"] = med(roll_plain(lit_daily))

# 2) plan construction only
out["lag_plan_only_ms"] = med(
    plan_only(lambda: lag_stitched(monthly(SFS[-1]), "month", "m_sales", "p"))
)
out["roll_plan_only_ms"] = med(
    plan_only(lambda: rolling_stitched(
        daily(SFS[-1]), "day",
        F.col("daily_value").cast("decimal(38,2)"), 6, "s", "c"))
)

# 3) scale response
for sf in SFS:
    tag = sf.rsplit("sf", 1)[-1]
    out[f"lag_stitched_sf{tag}_ms"] = med(lag_run(lambda: monthly(sf)))
    out[f"lag_plain_sf{tag}_ms"] = med(lag_plain(lambda: monthly(sf)))
    out[f"roll_stitched_sf{tag}_ms"] = med(roll_run(lambda: daily(sf)))
    out[f"roll_plain_sf{tag}_ms"] = med(roll_plain(lambda: daily(sf)))

print(json.dumps(out, indent=2))
with open(os.path.join(os.path.dirname(__file__), "..", "STITCH_FLOOR.json"), "w") as fh:
    json.dump(out, fh, indent=2)
