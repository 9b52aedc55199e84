"""Skewed-join strategies — the 100 TB hot-key playbook, executable.

``skew_profile_orders_custkey`` (relational.py) DIAGNOSES skew; this
module acts on the diagnosis with both production remedies, each locked
by a plan/runtime test (tests/test_plans.py):

1. **Explicit salting** (:func:`salted_join`): the big side's join key is
   widened with a deterministic salt derived from a unique column
   (``pmod(xxhash64(salt_src), n_salts)`` — never ``rand()``, so a task
   retry reproduces the same salt and the result stays exactly equal to
   the unsalted join); the small-but-unbroadcastable side is exploded
   ``n_salts`` times. A key carrying 70% of the fact table then spreads
   over ``n_salts`` reducers instead of melting one. This is the remedy
   you reach for when the skewed side must ALSO avoid broadcast (dim too
   big) and you cannot rely on runtime re-planning — e.g. a skewed
   aggregate-under-join at a known hot key (anonymous/guest user, null
   bucket, the one viral item).

2. **AQE skew-join** (session default ``spark.sql.adaptive.skewJoin``):
   for sort-merge joins Spark splits oversized partitions at runtime.
   tests/test_plans.py::test_aqe_splits_skewed_smj runs a genuinely
   skewed SMJ under production-shaped thresholds and asserts the
   executed plan carries ``skew=true`` — the runtime path is exercised,
   not just configured. Measured caveat that matters at 100 TB: AQE
   splits a skewed reduce partition along MAP-side shuffle-block
   boundaries (``ShufflePartitionsUtil.createSkewPartitionSpecs``
   returns None when the hot reducer's bytes sit in a single map
   block), so a fact table written as few huge row groups/files feeds
   few map tasks and silently defeats the split — keep row groups and
   files sized so every scan produces many map blocks, or rebalance
   upstream. Remedy 1 has no such dependency, which is why the engine
   ships it as the deterministic fallback.

The registry query ``skewed_join_sales`` runs remedy 1 over a hot-key
relation derived from ``events``: 70% of rows collapse onto one
``profile_key`` (the guest-user shape real clickstreams have), the
per-key profile dim is aggregated from the same table, and the salted
join's aggregate must hash-match a DuckDB oracle that states the PLAIN
join — proving salting changes the distribution, never the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

N_SALTS = 8

# 70% of user ids collapse into the -1 "guest" key — deterministic,
# oracle-mirrored. NULL user_id falls through to the ELSE branch (NULL
# key) and drops out of the inner join identically in both engines.
_PROFILE_KEY = "CASE WHEN user_id % 10 < 7 THEN -1 ELSE user_id END"
_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


def skewed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"].withColumn(
        "profile_key", F.expr(_PROFILE_KEY)
    )


def profile_dim(ev: DataFrame) -> DataFrame:
    """Per-profile-key spend profile — the 'too big to broadcast' dim
    stand-in (at 100 TB a user-profile dim is itself TB-scale)."""
    return ev.groupBy("profile_key").agg(
        F.expr(f"SUM({_CENTS})").alias("profile_cents"),
        F.count(F.lit(1)).alias("profile_events"),
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Inner-join ``big`` (skewed on ``key``) with ``dim`` (one row per
    key) by salting: big rows get ``_salt = pmod(xxhash64(salt_src),
    n_salts)`` (deterministic — survives task retries), dim rows are
    replicated once per salt via ``explode``. The join runs on
    ``(key, _salt)`` with a ``merge`` hint so the demonstration cannot
    silently degrade into a broadcast (the scenario is 'dim too big to
    broadcast'); each hot key now occupies ``n_salts`` shuffle
    partitions. Exactly equal to the unsalted join: every big row meets
    precisely the one dim replica carrying its salt.

    ``salt_src`` must be HIGH-CARDINALITY WITHIN each hot key (a row id,
    event id, or similar unique column). If it is constant per key —
    worst case, the join key itself — every hot-key row hashes to one
    salt and the join silently keeps its skew while paying the dim
    explosion. Passing the join key is therefore rejected outright
    (ADVICE r7); correctness never depends on the choice, only spread."""
    if salt_src == key:
        raise ValueError(
            "salt_src must not be the join key: a per-key-constant salt"
            " puts every hot-key row in one salt bucket and defeats the"
            " spread (pass a unique/high-cardinality column instead)"
        )
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(dim_s.hint("merge"), [key, "_salt"], "inner").drop(
        "_salt"
    )


def skewed_join_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join under explicit salting, certified against the plain
    join's SQL: per event_type, the event count, exact cents total, and
    two join-binding sums (each event's profile aggregates) that only
    match if every row met exactly its own profile exactly once."""
    ev = skewed_events(spark, sf_dir)
    dim = profile_dim(ev)
    j = salted_join(ev, dim, "profile_key", "event_id")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(f"SUM({_CENTS})").alias("total_cents"),
            F.sum("profile_cents").alias("profile_cents_weight"),
            F.sum("profile_events").alias("profile_events_weight"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "skewed_join_sales": skewed_join_sales,
}

ORACLES = {
    # the oracle states the UNSALTED join — a hash match proves the
    # salted physical strategy preserved exact join semantics
    "skewed_join_sales": (
        f"WITH e AS (SELECT *, {_PROFILE_KEY} AS profile_key FROM events),"
        f" d AS (SELECT profile_key, SUM({_CENTS}) AS profile_cents,"
        " COUNT(*) AS profile_events FROM e GROUP BY profile_key)"
        " SELECT e.event_type, COUNT(*) AS n_events,"
        f" CAST(SUM({_CENTS.replace('value', 'e.value')}) AS BIGINT)"
        " AS total_cents,"
        " CAST(SUM(d.profile_cents) AS BIGINT) AS profile_cents_weight,"
        " CAST(SUM(d.profile_events) AS BIGINT) AS profile_events_weight"
        " FROM e JOIN d USING (profile_key)"
        " GROUP BY e.event_type ORDER BY e.event_type"
    ),
}
