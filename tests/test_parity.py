"""Run every registry query against its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate, strict (no float tolerance)."""

from __future__ import annotations

import pytest

from intellect_bi_spark.registry import ORACLES, QUERIES

from .parity import assert_parity


def test_every_query_has_callable_and_runs_are_registered():
    assert QUERIES, "registry must not be empty"
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert_parity(df, duck, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns
