"""SCD2 dimension-versioning semantics (operators/scd.py, r8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from intellect_bi_spark.operators import scd


def test_scd2_version_chains(spark, sf_dir):
    h = scd.scd2_history(spark, sf_dir).cache()
    # every key has exactly one current row (valid_to NULL)
    per_key = h.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("valid_to").isNull().cast("long")).alias("n_cur"),
        F.max("version").alias("vmax"),
    )
    assert per_key.filter("n_cur != 1").count() == 0
    # chain length matches slice membership: both slices -> 3 versions
    both = per_key.filter(
        (F.col("c_custkey") % scd.CH1_MOD == scd.CH1_REM)
        & (F.col("c_custkey") % scd.CH2_MOD == scd.CH2_REM)
    )
    assert both.filter("n != 3 OR vmax != 3").count() == 0
    neither = per_key.filter(
        (F.col("c_custkey") % scd.CH1_MOD != scd.CH1_REM)
        & (F.col("c_custkey") % scd.CH2_MOD != scd.CH2_REM)
    )
    assert neither.filter("n != 1").count() == 0
    # valid ranges are contiguous: each non-final row's valid_to equals
    # the next version's valid_from
    nxt = h.select(
        "c_custkey",
        (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    gaps = (
        h.join(nxt, ["c_custkey", "version"])
        .filter(F.col("valid_to") != F.col("next_from"))
        .count()
    )
    assert gaps == 0
    # compounding: a both-slices key's final balance = base + both deltas
    sample = (
        h.filter(F.col("valid_to").isNull())
        .join(
            h.filter(F.col("version") == 1).select(
                "c_custkey", F.col("cents").alias("cents0")
            ),
            "c_custkey",
        )
        .filter(
            (F.col("c_custkey") % scd.CH1_MOD == scd.CH1_REM)
            & (F.col("c_custkey") % scd.CH2_MOD == scd.CH2_REM)
        )
    )
    bad = sample.filter(
        F.col("cents")
        != F.col("cents0") + scd.CH1_DELTA + scd.CH2_DELTA
    ).count()
    assert bad == 0
    h.unpersist()


def test_forward_fill_leading_and_interior_gaps(spark):
    """Synthetic spine covering the shapes the fixture may not produce:
    a key whose series STARTS with gaps (grp=0 run stays NULL with NULL
    staleness), interior multi-day runs (staleness counts up), and a
    fully-observed key (no-op)."""
    import datetime as dt

    from intellect_bi_spark.operators.temporal import forward_fill

    d = dt.date
    rows = [
        # key 'a': leading gaps, then obs 10 at day3, gaps, obs 20 at day6
        ("a", d(2024, 1, 1), None),
        ("a", d(2024, 1, 2), None),
        ("a", d(2024, 1, 3), 10),
        ("a", d(2024, 1, 4), None),
        ("a", d(2024, 1, 5), None),
        ("a", d(2024, 1, 6), 20),
        # key 'b': fully observed
        ("b", d(2024, 1, 1), 7),
        ("b", d(2024, 1, 2), 8),
    ]
    j = spark.createDataFrame(rows, "k string, day date, v long")
    out = {
        (r["k"], r["day"]): (
            r["v_filled"], r["is_gap"], r["days_since_obs"]
        )
        for r in forward_fill(j, key="k", day="day", val="v").collect()
    }
    assert out[("a", d(2024, 1, 1))] == (None, 1, None)
    assert out[("a", d(2024, 1, 2))] == (None, 1, None)
    assert out[("a", d(2024, 1, 3))] == (10, 0, 0)
    assert out[("a", d(2024, 1, 4))] == (10, 1, 1)
    assert out[("a", d(2024, 1, 5))] == (10, 1, 2)
    assert out[("a", d(2024, 1, 6))] == (20, 0, 0)
    assert out[("b", d(2024, 1, 1))] == (7, 0, 0)
    assert out[("b", d(2024, 1, 2))] == (8, 0, 0)
