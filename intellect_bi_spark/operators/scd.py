"""Slowly-changing-dimension (SCD Type 2) maintenance — 100 TB extension.

The dimension-versioning pattern every warehouse runs (Delta/Iceberg
``MERGE INTO`` with close-old-row/insert-new-row semantics), expressed
Spark-first: the post-merge VERSION TABLE is derived declaratively —
initial load ∪ change batches, then one per-key window pass assigns
``version = row_number`` and ``valid_to = lead(valid_from)`` (NULL ⇒
current row). No reference counterpart (the reference's dims are static
CSV loads, reference etl/load_sales.py); charter extension alongside the
other layout/maintenance operators.

Scale design: the whole computation is key-partitioned — the union is a
narrow map-side concat, and the single window partitions by the
dimension key (millions of tiny per-key frames, never a global sort).
That is the plan a 100 TB dimension rewrite wants: shuffle once on the
key, write back partitioned/bucketed on the same key (layout.py).

The change batches are closed-form functions of ``c_custkey`` (two
overlapping slices at two effective dates, so version chains reach
length 3 and the second change COMPOUNDS on the first for keys in both
slices), which lets the DuckDB oracle restate the full post-merge state
exactly — every version row, boundary date, and compounded balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import P

D0, D1, D2 = "2024-01-01", "2024-06-01", "2024-09-01"
CH1_MOD, CH1_REM, CH1_DELTA = 10, 3, 10_000  # +100.00 to slice 1
CH2_MOD, CH2_REM, CH2_DELTA = 7, 2, 2_500  # +25.00 and re-segment slice 2
CH2_SEGMENT = "MIGRATED"
# keeps every binding operand positive (TPC-H acctbal ≥ −999.99 ⇒ cents
# ≥ −99,999), so Spark and DuckDB never disagree on a negative modulo
_CENTS_OFFSET = 1_000_000


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["customer"].select(
        "c_custkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-merge SCD2 version table: (c_custkey, version,
    valid_from, valid_to, cents, seg) after the initial load at D0 and
    the two change batches at D1/D2."""
    dim = _dim(spark, sf_dir)
    in1 = F.col("c_custkey") % CH1_MOD == CH1_REM
    in2 = F.col("c_custkey") % CH2_MOD == CH2_REM
    base = dim.select(
        "c_custkey",
        F.lit(D0).cast("date").alias("valid_from"),
        "cents",
        "seg",
    )
    ch1 = dim.filter(in1).select(
        "c_custkey",
        F.lit(D1).cast("date").alias("valid_from"),
        (F.col("cents") + CH1_DELTA).alias("cents"),
        "seg",
    )
    # the second batch carries the CURRENT state at D2: compounds on
    # change 1 for keys in both slices
    ch2 = dim.filter(in2).select(
        "c_custkey",
        F.lit(D2).cast("date").alias("valid_from"),
        (
            F.col("cents")
            + F.when(in1, F.lit(CH1_DELTA)).otherwise(F.lit(0))
            + CH2_DELTA
        ).alias("cents"),
        F.lit(CH2_SEGMENT).alias("seg"),
    )
    hist = base.unionByName(ch1).unionByName(ch2)
    w = Window.partitionBy("c_custkey").orderBy("valid_from")
    return hist.select(
        "c_custkey",
        F.row_number().over(w).alias("version"),
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        "cents",
        "seg",
    )


def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver face of the SCD2 merge: per-version exact summary of the
    whole history table — row count, currency split, balance totals, and
    an id+state-weighted binding over every (key, version, state,
    boundary-date) tuple, so one wrong compounded balance, missed
    close-out, or misordered version flips the row."""
    h = scd2_history(spark, sf_dir)
    bind = (
        f"((c_custkey % {P}) * ((version * 1000003"
        f" + (cents + {_CENTS_OFFSET})"
        f" + DATEDIFF(valid_from, DATE '{D0}') * 131"
        f" + COALESCE(DATEDIFF(valid_to, DATE '{D0}'), 999) * 523) % {P}))"
        f" % {P}"
    )
    return (
        h.groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("valid_to").isNull()).cast("long")).alias(
                "n_current"
            ),
            F.sum("cents").alias("sum_cents"),
            F.sum(
                (F.col("seg") == CH2_SEGMENT).cast("long")
            ).alias("n_migrated"),
            F.sum(F.expr(bind)).alias("state_binding"),
        )
        .orderBy("version")
    )


QUERIES = {
    "scd2_customer_versions": scd2_customer_versions,
}

ORACLES = {
    # the full merge restated: UNION ALL of initial load + both change
    # batches (the compounding CASE stated explicitly), then the same
    # per-key window derivation of version/valid_to
    "scd2_customer_versions": (
        "WITH dim AS (SELECT c_custkey,"
        " CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,"
        " c_mktsegment AS seg FROM customer),"
        f" hist AS (SELECT c_custkey, DATE '{D0}' AS valid_from,"
        " cents, seg FROM dim"
        f" UNION ALL SELECT c_custkey, DATE '{D1}',"
        f" cents + {CH1_DELTA}, seg FROM dim"
        f" WHERE c_custkey % {CH1_MOD} = {CH1_REM}"
        f" UNION ALL SELECT c_custkey, DATE '{D2}',"
        f" cents + (CASE WHEN c_custkey % {CH1_MOD} = {CH1_REM}"
        f" THEN {CH1_DELTA} ELSE 0 END) + {CH2_DELTA},"
        f" '{CH2_SEGMENT}' FROM dim"
        f" WHERE c_custkey % {CH2_MOD} = {CH2_REM}),"
        " v AS (SELECT c_custkey,"
        " ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY valid_from)"
        " AS version, valid_from,"
        " LEAD(valid_from) OVER (PARTITION BY c_custkey"
        " ORDER BY valid_from) AS valid_to, cents, seg FROM hist)"
        " SELECT version, COUNT(*) AS n_rows,"
        " CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_current,"
        " CAST(SUM(cents) AS BIGINT) AS sum_cents,"
        f" CAST(SUM(CASE WHEN seg = '{CH2_SEGMENT}' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_migrated,"
        f" CAST(SUM(((c_custkey % {P}) * ((version * 1000003"
        f" + (cents + {_CENTS_OFFSET})"
        f" + (valid_from - DATE '{D0}') * 131"
        f" + COALESCE(valid_to - DATE '{D0}', 999) * 523) % {P}))"
        f" % {P}) AS BIGINT) AS state_binding"
        " FROM v GROUP BY version ORDER BY version"
    ),
}
