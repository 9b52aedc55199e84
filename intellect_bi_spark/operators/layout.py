"""Multi-dimensional data layout (Z-order clustering) — 100 TB extension.

Parquet data skipping works off per-file (and per-row-group) min/max
statistics. A time-sorted fact layout prunes time predicates but every
file spans the full key range of every OTHER column, so a ``user_id =``
or composite filter still reads everything. Z-ORDERING interleaves the
bits of two dimension keys into one sort key, so a range-partitioned
write clusters rows into files bounded in BOTH dimensions at once — the
layout operator behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here
from Spark primitives: a pure-SQL bit-interleave expression +
``repartitionByRange`` + ``sortWithinPartitions``.

The z-value arithmetic is integer-exact and stated identically in both
engines (``zvalue_sql`` / ``zvalue_duck``), so the registry query
``zorder_layout_stats`` certifies it against a DuckDB oracle; the layout
BENEFIT (files bounded in both dimensions, vs a time-sorted baseline
whose files span the whole user range) is asserted at the file level in
tests/test_plans.py::test_zorder_layout_bounds_file_ranges.

Scale notes: the z-value is a map-side projection (whole-stage codegen,
no Python); ``repartitionByRange`` samples the key distribution and
range-splits it, which is exactly one extra shuffle at write time — the
standard price of a clustered layout, paid once per table rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import P

Z_BITS = 16
# day index epoch for the events table (fixture events start 2024-01-01;
# any date at or before every row works — the z-order only needs a
# non-negative bounded int)
_DAY_EPOCH = "2020-01-01"


def zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """Spark SQL text: Morton/Z interleave of the low ``bits`` bits of two
    non-negative integer expressions — a occupies even bit positions, b
    odd. Pure shift/mask arithmetic: stays in whole-stage codegen.

    Operands are cast to BIGINT first: with the default bits=16 the
    interleave shifts to bit position 31, where an INT32 operand would
    silently wrap negative in Spark but raise an overflow error in
    DuckDB — the cast makes the helpers safe for any integral input."""
    ca, cb = f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft((shiftright({ca}, {i}) & 1), {2 * i})")
        terms.append(f"shiftleft((shiftright({cb}, {i}) & 1), {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zvalue_duck(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB SQL: the same interleave via native shift operators (same
    BIGINT-cast rationale as :func:`zvalue_sql`)."""
    ca, cb = f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"(({ca} >> {i} & 1) << {2 * i})")
        terms.append(f"(({cb} >> {i} & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _norm_sql(x: str, lo: str, hi: str, bits: int) -> str:
    """Min-max normalize integer expression ``x`` onto the full
    ``bits``-bit range — exact integer arithmetic. Without this, a
    dimension whose live range uses fewer bits than the other's loses
    every interleave split to the wider dimension (its varying bits all
    sit above the narrow one's), and the z-curve degenerates to a plain
    sort on the wide column. Same move Delta's OPTIMIZE ZORDER makes by
    interleaving range-partition ids rather than raw values."""
    top = (1 << bits) - 1
    # BIGINT cast on X ITSELF, not on the subtraction result (r8 review):
    # casting (x - lo) still evaluates the subtraction in the input's
    # type, so an INT32 column spanning more than 2^31 (x near INT_MAX,
    # lo near INT_MIN) overflows BEFORE the cast — and the multiply by
    # 65535 overflows for live ranges >= 32769. Promoting x first makes
    # every step 64-bit; same fix applied to the hi - lo divisor.
    return (
        f"((CAST({x} AS BIGINT) - {lo}) * {top})"
        f" DIV GREATEST(CAST({hi} AS BIGINT) - {lo}, 1)"
    )


def _with_z(df: DataFrame, a: str, b: str, bits: int = Z_BITS) -> DataFrame:
    """Attach the normalized z-value as column ``_z`` (plus the transient
    ``_na``/``_nb``/bounds columns): ONE shared implementation of
    bounds-aggregate → broadcast → normalize → interleave, so the key the
    oracle certifies (zorder_layout_stats) is by construction the key the
    layout writer sorts by (zorder_by)."""
    bounds = df.agg(
        F.expr(f"MIN({a})").alias("_a_lo"),
        F.expr(f"MAX({a})").alias("_a_hi"),
        F.expr(f"MIN({b})").alias("_b_lo"),
        F.expr(f"MAX({b})").alias("_b_hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_na", F.expr(_norm_sql(a, "_a_lo", "_a_hi", bits)))
        .withColumn("_nb", F.expr(_norm_sql(b, "_b_lo", "_b_hi", bits)))
        .withColumn("_z", F.expr(zvalue_sql("_na", "_nb", bits)))
    )


_Z_TMP_COLS = ("_z", "_na", "_nb", "_a_lo", "_a_hi", "_b_lo", "_b_hi")


def zorder_by(
    df: DataFrame, a: str, b: str, n_files: int, bits: int = Z_BITS
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range partitions of the z-value of
    (a, b), sorted within each — write the result and every output file
    is min/max-bounded in BOTH dimensions. ``a``/``b`` are SQL
    expressions yielding non-negative ints; each is min-max normalized
    onto the full ``bits``-bit range (one 4-scalar aggregate, broadcast)
    before interleaving."""
    return (
        _with_z(df, a, b, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(*_Z_TMP_COLS)
    )


_EV_DAY = f"DATEDIFF(CAST(ts AS DATE), DATE '{_DAY_EPOCH}')"
_EV_DAY_DUCK = f"(CAST(ts AS DATE) - DATE '{_DAY_EPOCH}')"


def _norm_duck(x: str, lo: str, hi: str, bits: int) -> str:
    # same pre-subtraction BIGINT promotion as _norm_sql (r8 review)
    top = (1 << bits) - 1
    return (
        f"((CAST({x} AS BIGINT) - {lo}) * {top}"
        f" // GREATEST(CAST({hi} AS BIGINT) - {lo}, 1))"
    )


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution of the events (user_id, day) z-values — the
    oracle-certified half of the Z-order operator: a hash match proves
    the normalize + bit-interleave arithmetic (the exact clustering key
    :func:`zorder_by` sorts by) is correct on every row."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    zdf = _with_z(ev, "user_id", _EV_DAY).select(
        "event_id", F.col("_z").alias("z")
    )
    return zdf.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
        F.sum("z").alias("z_sum"),
        F.sum(F.expr(f"((event_id % {P}) * (z % {P})) % {P}")).alias(
            "id_weighted_binding"
        ),
    )


N_BUCKETS = 8


def bucket_table_names(token: str) -> tuple[str, str]:
    """The per-call table names — exposed separately from the writes so
    callers can register BOTH names for cleanup BEFORE any write starts
    (r8 review: a failure between the two saveAsTable calls previously
    leaked the first table in the warehouse, since the names were only
    returned on full success)."""
    return f"sgraft_bkt_orders_{token}", f"sgraft_bkt_cust_{token}"


def bucketed_tables(
    spark: SparkSession, sf_dir: str, token: str
) -> tuple[str, str]:
    """Write orders and customer as Hive-BUCKETED tables (bucketBy on the
    join key, sortBy within buckets) under the :func:`bucket_table_names`
    names; returns them. Callers own the drop (see
    :func:`bucketed_join_sales`)."""
    t = load_tables(spark, sf_dir)
    tbl_o, tbl_c = bucket_table_names(token)
    (
        t["orders"]
        .write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(tbl_o)
    )
    (
        t["customer"]
        .write.bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(tbl_c)
    )
    return tbl_o, tbl_c


def bucketed_join_result(spark: SparkSession, tbl_o: str, tbl_c: str):
    """The co-located join over two bucketed tables: with both sides
    bucketed N_BUCKETS on the join key, the SortMergeJoin reads bucket i
    against bucket i directly — the executed plan carries NO shuffle
    exchange on either join input (locked by
    tests/test_plans.py::test_bucketed_join_has_no_exchange). The merge
    hint keeps the small customer side out of a broadcast so the
    demonstrated property is the bucketed SMJ, not a broadcast dodge."""
    o = spark.table(tbl_o)
    c = spark.table(tbl_c).hint("merge")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
            ).alias("total_cents"),
        )
        .orderBy("c_mktsegment")
    )


def bucketed_join_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via table bucketing — the charter's
    'bucketing for co-located joins' made executable (r8): orders and
    customer are written bucketed N_BUCKETS on the join key, the join
    plan exchanges NOTHING (each task zips bucket i with bucket i), and
    the aggregate must hash-match a DuckDB oracle stating the PLAIN join
    — proving the bucketed physical layout preserved exact semantics.

    At 100 TB this is the layout decision that amortizes: one bucketed
    write (the same one-extra-shuffle price as the z-order rewrite
    above) removes the fact-table exchange from EVERY subsequent join on
    that key. The tables are written under a unique per-call token and
    dropped before returning; the one-row-per-segment result is
    localCheckpointed first (the streamops store lifecycle)."""
    import uuid

    token = uuid.uuid4().hex[:12]
    # names resolved BEFORE any write: a failure mid-way through the two
    # bucketed writes still drops whatever landed (r8 review)
    tbl_o, tbl_c = bucket_table_names(token)
    try:
        bucketed_tables(spark, sf_dir, token)
        return bucketed_join_result(spark, tbl_o, tbl_c).localCheckpoint(
            eager=True
        )
    finally:
        for tbl in (tbl_o, tbl_c):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


QUERIES = {
    "zorder_layout_stats": zorder_layout_stats,
    "bucketed_join_sales": bucketed_join_sales,
}

ORACLES = {
    # the oracle states the PLAIN join — a hash match proves the bucketed
    # shuffle-free physical strategy preserved exact join semantics
    "bucketed_join_sales": (
        "SELECT c_mktsegment, COUNT(*) AS n_orders,"
        " CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS total_cents"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    "zorder_layout_stats": (
        f"WITH e AS (SELECT event_id, user_id, {_EV_DAY_DUCK} AS day_i"
        " FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
        " b AS (SELECT MIN(user_id) AS a_lo, MAX(user_id) AS a_hi,"
        " MIN(day_i) AS b_lo, MAX(day_i) AS b_hi FROM e),"
        f" n AS (SELECT event_id,"
        f" {_norm_duck('user_id', 'a_lo', 'a_hi', Z_BITS)} AS na,"
        f" {_norm_duck('day_i', 'b_lo', 'b_hi', Z_BITS)} AS nb FROM e, b),"
        f" z AS (SELECT event_id, {zvalue_duck('na', 'nb')} AS z FROM n)"
        " SELECT COUNT(*) AS n_rows,"
        " CAST(MIN(z) AS BIGINT) AS z_min,"
        " CAST(MAX(z) AS BIGINT) AS z_max,"
        " CAST(SUM(z) AS BIGINT) AS z_sum,"
        f" CAST(SUM(((event_id % {P}) * (z % {P})) % {P}) AS BIGINT)"
        " AS id_weighted_binding"
        " FROM z"
    ),
}
