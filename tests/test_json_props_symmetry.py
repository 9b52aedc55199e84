"""Dirty-payload symmetry for the JSON ingest gate (ADVICE r9): the
fixture events are clean, so this locks the corrupt-row contract on a
literal table covering every known engine-divergence class — the SAME
production extraction (eventops._json_props_agg) against the SAME
oracle SQL text, just pointed at the dirty rows."""

from __future__ import annotations

import duckdb

from intellect_bi_spark.operators import eventops

from .parity import assert_parity

# one row per divergence class; event_type buckets group the expected
# outcomes so a single asymmetry flips an aggregate cell
_DIRTY = [
    ("parses", '{"k": 12}'),  # canonical int
    ("parses", '{"k": -3}'),  # canonical negative
    ("parses", '{"k": 0}'),
    ("nulls", '{"k": 12.5}'),  # fractional: Spark truncates, Duck rounds
    ("nulls", '{"k": "07"}'),  # integral STRING — parses (regex admits it)
    ("nulls", '{"k": 1e3}'),  # scientific
    ("nulls", '{"k": "abc"}'),  # non-numeric string
    ("nulls", '{"k": " 7 "}'),  # padded (Duck bare-casts this, Spark too)
    ("nulls", '{"k": "+5"}'),  # signed-plus (Duck bare-casts this)
    ("nulls", '{"k": 99999999999999999999}'),  # BIGINT overflow
    # trailing newline (ADVICE r10): Java's '$' matches before a final
    # '\n' while RE2's does not, so under ^...$ this row parsed on Spark
    # but NULLed in DuckDB; the \A...\z anchors reject it on BOTH
    ("nulls", '{"k": "7\\n"}'),
    ("nulls", '{"k": "\\n7"}'),  # leading newline (rejected either way)
    ("nulls", "not json at all"),  # malformed document
    ("nulls", '{"other": 1}'),  # key absent
    ("nulls", None),  # NULL document
]


def test_dirty_payloads_degrade_identically(spark):
    rows = list(_DIRTY)
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = eventops._json_props_agg(df)

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, props VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    assert_parity(
        got,
        con,
        eventops.ORACLES["json_props_stats"],
        name="json_props_dirty_symmetry",
    )


def test_gate_semantics_pinned(spark):
    """Pin the per-class outcome (not just cross-engine agreement):
    canonical ints parse, everything else is NULL."""
    rows = [(t, p) for t, p in _DIRTY]
    df = spark.createDataFrame(rows, "event_type string, props string")
    out = {
        r["event_type"]: r
        for r in eventops._json_props_agg(df).collect()
    }
    # parses bucket: 12, -3, 0 -> all parsed
    assert out["parses"]["n_parsed"] == 3
    assert out["parses"]["sum_k"] == 9
    # nulls bucket: only '07' parses (integral by the gate regex)
    assert out["nulls"]["n_parsed"] == 1
    assert out["nulls"]["sum_k"] == 7
