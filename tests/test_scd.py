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
