"""Partitioned replacements for global (unpartitioned) window operations.

An unpartitioned ``Window.orderBy(...)`` funnels the whole frame through ONE
task (Spark warns "No Partition Defined for Window operation"). On the
post-aggregation frames this engine lags over (months / quarters of a sales
fact) the cardinality is bounded, so the single task is *correct* — but it
is still a serialization point the plan does not need, and at 100 TB the
same code path may be handed an unbounded frame by mistake. These helpers
keep every window partitioned.

``lag_stitched`` computes the exact semantics of

    LAG(value) OVER (ORDER BY order_col)

for frames whose order key is unique per row (true for any
``groupBy(period)`` aggregate), in three fully-partitioned steps:

1. lag within a coarse bucket of the order key (default: calendar year) —
   ``Window.partitionBy(bucket).orderBy(order_col)``;
2. a per-bucket "last value" summary (one row per bucket) and, for each
   bucket, the nearest EARLIER bucket's last value via a triangular join on
   the tiny bucket relation — exact even when buckets are missing, unlike a
   ``bucket - 1`` equi-join;
3. a broadcast join patching the one NULL row per bucket (its first row)
   with that boundary value.

Contract: ``value_col`` must be non-null (the coalesce in step 3 cannot
distinguish "first row of bucket" from "previous value was NULL"). Every
call site lags a non-null aggregate.

This is the same bucket-and-stitch construction as the skew-immune as-of
join (operators/temporal.py:95-130), applied to LAG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lag_stitched(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Add ``out_col`` = LAG(value_col) OVER (ORDER BY order_col) without an
    unpartitioned window. ``order_col`` must be unique per row and
    ``value_col`` non-null (see module docstring)."""
    b = bucket if bucket is not None else F.year(F.col(order_col))
    keyed = df.withColumn("_lsg_bkt", b)

    w_in = Window.partitionBy("_lsg_bkt").orderBy(order_col)
    w_full = w_in.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # The per-bucket boundary values are carved out of the window pass
    # (row_number + full-frame count share w_in's WindowExec; the
    # rn == cnt filter is not expressible as an aggregate, so Catalyst
    # cannot collapse the branch into a second, differently-shaped
    # aggregate). The boundary branch still re-evaluates the upstream
    # subtree (AQE does not currently reuse the exchange across these
    # stages) — acceptable by contract: lag_stitched is only called on
    # post-aggregation frames, where the duplicated work is one bounded
    # re-aggregation, not a second pass over raw data. At 100 TB you
    # would persist the aggregated frame first; the helper deliberately
    # does not persist on the caller's behalf.
    inner = (
        keyed.withColumn(out_col, F.lag(value_col).over(w_in))
        .withColumn("_lsg_rn", F.row_number().over(w_in))
        .withColumn("_lsg_cnt", F.count(F.lit(1)).over(w_full))
    )

    # One row per bucket: the bucket's last (by order key) value.
    per_bkt = inner.filter(F.col("_lsg_rn") == F.col("_lsg_cnt")).select(
        "_lsg_bkt", F.col(value_col).alias("_lsg_last")
    )
    inner = inner.drop("_lsg_rn", "_lsg_cnt")
    # Nearest earlier bucket's last value. Triangular join on the bucket
    # relation (rows = #distinct buckets, e.g. #years — tens, not data-
    # scale), so the quadratic candidate set is trivially small and the
    # result is exact under bucket gaps.
    lhs = per_bkt.select(F.col("_lsg_bkt"))
    rhs = per_bkt.select(
        F.col("_lsg_bkt").alias("_lsg_rbkt"), F.col("_lsg_last")
    )
    prev_bkt = (
        lhs.join(F.broadcast(rhs), F.col("_lsg_rbkt") < F.col("_lsg_bkt"))
        .groupBy("_lsg_bkt")
        .agg(F.max_by("_lsg_last", "_lsg_rbkt").alias("_lsg_prev"))
    )

    return (
        inner.join(F.broadcast(prev_bkt), "_lsg_bkt", "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_lsg_prev")))
        .drop("_lsg_bkt", "_lsg_prev")
    )


def rolling_stitched(
    df: DataFrame,
    order_col: str,
    value_col: Column,
    k: int,
    sum_col: str,
    cnt_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Add ``sum_col`` / ``cnt_col`` = SUM(value) / COUNT(*) OVER
    (ORDER BY order_col ROWS BETWEEN k PRECEDING AND CURRENT ROW) without
    an unpartitioned window. ``order_col`` must be unique per row (true
    for any ``groupBy(period)`` aggregate — same contract as
    :func:`lag_stitched`).

    Construction: window within a coarse bucket of the order key, with the
    first ≤ k rows of each bucket patched by CARRY rows — for each target
    bucket, the k globally-latest rows drawn from the per-bucket tails of
    ALL earlier buckets (the tails relation is ≤ k · #buckets rows, so the
    triangular bucket pairing is trivially small and exact under bucket
    gaps and under buckets shorter than k). Carry rows flow through the
    same bucket-partitioned window (they sort first — strictly smaller
    order keys) and are dropped afterwards, so every remaining row's frame
    equals the global ROWS frame exactly. Like lag_stitched, the side
    branches re-evaluate the upstream subtree; call this on
    post-aggregation frames (or persist first)."""
    b = bucket if bucket is not None else F.year(F.col(order_col))
    keyed = df.withColumn("_rsg_bkt", b).withColumn("_rsg_carry", F.lit(0))

    w_desc = Window.partitionBy("_rsg_bkt").orderBy(F.desc(order_col))
    tails = (
        keyed.withColumn("_rsg_rn", F.row_number().over(w_desc))
        .filter(F.col("_rsg_rn") <= k)
        .drop("_rsg_rn")
        .withColumnRenamed("_rsg_bkt", "_rsg_src")
    )
    bkts = keyed.select(F.col("_rsg_bkt").alias("_rsg_tgt")).distinct()
    w_tgt = Window.partitionBy("_rsg_tgt").orderBy(F.desc(order_col))
    carries = (
        bkts.join(F.broadcast(tails), F.col("_rsg_src") < F.col("_rsg_tgt"))
        .withColumn("_rsg_rn", F.row_number().over(w_tgt))
        .filter(F.col("_rsg_rn") <= k)
        .drop("_rsg_src", "_rsg_rn")
        .withColumnRenamed("_rsg_tgt", "_rsg_bkt")
        .withColumn("_rsg_carry", F.lit(1))
    )

    w = (
        Window.partitionBy("_rsg_bkt")
        .orderBy(order_col)
        .rowsBetween(-k, Window.currentRow)
    )
    return (
        keyed.unionByName(carries.select(*keyed.columns))
        .withColumn(sum_col, F.sum(value_col).over(w))
        .withColumn(cnt_col, F.count(F.lit(1)).over(w))
        .filter(F.col("_rsg_carry") == 0)
        .drop("_rsg_bkt", "_rsg_carry")
    )


def last_k_by(df: DataFrame, order_col: str, k: int) -> DataFrame:
    """The ``k`` rows with the largest ``order_col`` — a top-k selection,
    which Spark executes as TakeOrderedAndProject (per-partition heap +
    driver-side merge of k rows), NOT a global sort or window. The
    idiomatic replacement for ``row_number() OVER (ORDER BY c DESC) <= k``
    on a frame with no partition key."""
    return df.orderBy(F.desc(order_col)).limit(k)
