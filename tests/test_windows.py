"""functions/windows.py: lag_stitched must equal LAG(...) OVER (ORDER BY ...)
exactly — including across bucket boundaries and bucket GAPS (a missing
year between rows), which the triangular nearest-earlier-bucket join must
bridge."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from intellect_bi_spark.functions.windows import lag_stitched, last_k_by


def _check(spark, rows):
    df = spark.createDataFrame(rows, "d date, v double")
    got = {
        r["d"]: r["prev"]
        for r in lag_stitched(df, "d", "v", "prev").collect()
    }
    want = {
        r["d"]: r["prev"]
        for r in df.withColumn(
            "prev", F.lag("v").over(Window.orderBy("d"))
        ).collect()
    }
    assert got == want, (got, want)


def test_lag_stitched_within_and_across_years(spark):
    rows = [
        (datetime.date(2023, 11, 1), 1.0),
        (datetime.date(2023, 12, 1), 2.0),
        (datetime.date(2024, 1, 1), 3.0),
        (datetime.date(2024, 2, 1), 4.0),
    ]
    _check(spark, rows)


def test_lag_stitched_bridges_bucket_gaps(spark):
    # 2024 entirely missing: 2025's first row must see 2023's last value
    rows = [
        (datetime.date(2023, 3, 1), 1.0),
        (datetime.date(2023, 9, 1), 2.0),
        (datetime.date(2025, 1, 1), 3.0),
        (datetime.date(2025, 6, 1), 4.0),
    ]
    _check(spark, rows)


def test_lag_stitched_single_row_and_single_bucket(spark):
    _check(spark, [(datetime.date(2024, 5, 1), 7.0)])
    _check(
        spark,
        [
            (datetime.date(2024, 1, 1), 1.0),
            (datetime.date(2024, 2, 1), 2.0),
        ],
    )


def test_lag_stitched_custom_bucket(spark):
    # quarter-bucket on month-grain rows
    rows = [
        (datetime.date(2024, m, 1), float(m)) for m in range(1, 13)
    ]
    df_bucket = F.quarter(F.col("d"))
    df = None  # readability: bucket passed through the helper below
    spark_df = (
        spark.createDataFrame(rows, "d date, v double")
    )
    got = {
        r["d"]: r["prev"]
        for r in lag_stitched(
            spark_df, "d", "v", "prev", bucket=df_bucket
        ).collect()
    }
    want = {
        r["d"]: r["prev"]
        for r in spark_df.withColumn(
            "prev", F.lag("v").over(Window.orderBy("d"))
        ).collect()
    }
    assert got == want


def test_lag_stitched_plan_has_no_unpartitioned_window(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), 1.0)], "d date, v double"
    )
    out = lag_stitched(df, "d", "v", "prev")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    # every windowspecdefinition must carry a partition expression before
    # the ordering spec (unpartitioned = spec starts with the order column
    # ascending): partitioned specs list the partition cols first
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_sg_bkt" in spec, plan


def test_last_k_by_matches_sort_limit(spark):
    rows = [(datetime.date(2024, 1, d), float(d)) for d in range(1, 20)]
    df = spark.createDataFrame(rows, "d date, v double")
    got = sorted(r["v"] for r in last_k_by(df, "d", 5).collect())
    assert got == [15.0, 16.0, 17.0, 18.0, 19.0]


def _check_rolling(spark, rows, k=6):
    from intellect_bi_spark.functions.windows import rolling_stitched

    df = spark.createDataFrame(rows, "d date, v double")
    got = {
        r["d"]: (r["s"], r["c"])
        for r in rolling_stitched(
            df, "d", F.col("v"), k, "s", "c"
        ).collect()
    }
    w = Window.orderBy("d").rowsBetween(-k, Window.currentRow)
    want = {
        r["d"]: (r["s"], r["c"])
        for r in df.withColumn("s", F.sum("v").over(w))
        .withColumn("c", F.count(F.lit(1)).over(w))
        .collect()
    }
    assert got == want, (got, want)


def test_rolling_stitched_across_years(spark):
    rows = [
        (datetime.date(2023, 12, 25 + i), float(i)) for i in range(5)
    ] + [(datetime.date(2024, 1, 1 + i), float(10 + i)) for i in range(8)]
    _check_rolling(spark, rows)


def test_rolling_stitched_short_buckets_and_gaps(spark):
    # 2023 has only 2 rows (< k) and 2024 is missing entirely: 2025's
    # first rows must draw carries from BOTH 2022 and 2023 tails
    rows = (
        [(datetime.date(2022, 6, 1 + i), float(i)) for i in range(4)]
        + [(datetime.date(2023, 3, 1), 100.0), (datetime.date(2023, 3, 2), 101.0)]
        + [(datetime.date(2025, 1, 1 + i), float(200 + i)) for i in range(3)]
    )
    _check_rolling(spark, rows)


def test_rolling_stitched_single_bucket(spark):
    rows = [(datetime.date(2024, 1, 1 + i), float(i)) for i in range(10)]
    _check_rolling(spark, rows, k=3)
