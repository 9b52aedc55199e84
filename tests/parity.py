"""Strict Spark-vs-DuckDB result comparison, modeled on the driver's check
(sort columns by name, order-insensitive row compare, value equality).

We compare EXACT values by default — the engine's numeric helpers
(`intellect_bi_spark.functions.numeric`) are designed to make doubles
bit-identical across engines; a strict local gate means the driver's
(possibly tolerance-less) gate passes too.
"""

from __future__ import annotations

import datetime
import math
from typing import Any


def _norm_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return list(df.columns), [tuple(r) for r in df.collect()]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, [tuple(r) for r in cur.fetchall()]


# Spark simple-type → DuckDB types whose Python/pandas rendering is
# value-identical. Anything outside the set (HUGEINT from a window SUM,
# DECIMAL from literal arithmetic, TIMESTAMP WITH TIME ZONE, ...) can
# hold the same VALUES yet render differently in the driver's hasher —
# CORRECTNESS_r09's compaction_plan red row was exactly this: local
# parity compared Python ints (equal) while the driver hashed DuckDB's
# HUGEINT rendering. This gate makes local green predict driver green.
_DUCK_OK = {
    "bigint": {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"},
    "int": {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"},
    "smallint": {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"},
    "tinyint": {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
    "binary": {"BLOB"},
}


def _type_ok(spark_t: str, duck_t: str) -> bool:
    if spark_t.startswith("array<") and spark_t.endswith(">"):
        return duck_t.endswith("[]") and _type_ok(
            spark_t[6:-1], duck_t[:-2]
        )
    if spark_t.startswith("decimal"):
        return duck_t.replace(" ", "") == spark_t.upper().replace(" ", "")
    return duck_t in _DUCK_OK.get(spark_t, set())


def assert_oracle_types(df, con, sql: str, name: str = ""):
    """Fail when a DuckDB oracle column's type would render differently
    from the Spark column's — the class of driver-hash mismatch that a
    value-level Python compare cannot see."""
    spark_types = dict(df.dtypes)
    rel = con.sql(sql)
    bad = []
    for col, dt in zip(rel.columns, rel.types):
        st = spark_types.get(col)
        if st is None:
            continue  # column-set mismatch is assert_parity's job
        if not _type_ok(st, str(dt)):
            bad.append((col, st, str(dt)))
    assert not bad, (
        f"{name}: oracle type drift (col, spark, duck): {bad} — add an "
        "explicit CAST in the oracle (or align the Spark side)"
    )


def assert_parity(df, con, sql: str, name: str = "", float_tol: float = 0.0):
    assert_oracle_types(df, con, sql, name=name)
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_norm = normalized_rows(s_cols, s_rows)
    d_norm = normalized_rows(d_cols, d_rows)
    if float_tol == 0.0:
        mismatches = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ]
    else:
        def close(a, b):
            if isinstance(a, float) and isinstance(b, float):
                return math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol)
            return a == b

        mismatches = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_norm, d_norm))
            if not (len(a) == len(b) and all(close(x, y) for x, y in zip(a, b)))
        ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
