"""Run every registry query against its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate, strict (no float tolerance)."""

from __future__ import annotations

import pytest

from intellect_bi_spark.registry import ORACLES, QUERIES

from .parity import assert_parity


_PIN_BASELINE: dict[str, int] = {}


def test_every_query_has_callable_and_runs_are_registered():
    assert QUERIES, "registry must not be empty"
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"
    # snapshot the pin registry before this module's 210-query sweep so
    # the tail test measures GROWTH, independent of what other test
    # modules pinned earlier in the session
    from intellect_bi_spark.functions import windows

    _PIN_BASELINE["n"] = len(windows._PERSISTED)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert_parity(df, duck, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns


def test_sweep_pin_working_set_bounded(spark):
    """VERDICT r10 #5 sweep lock: the two parametrized tests above just
    executed EVERY registry query (the driver-sweep shape).  One-shot
    pins are released by release_after_action, so across the sweep the
    pin registry may grow only by the non-releasable class (stitched-
    window inputs, whose pinned frames feed lazily-returned plans) — a
    standalone 210-query sweep measures 17 live pins total.  Pre-fix,
    every one-shot consumer (anomaly/erasure/tvd/bigram/dsir/pagerank/
    triangles/ndcg/pack/funnel/PQ) stacked on top of those toward the
    128 cap."""
    from intellect_bi_spark.functions import windows

    growth = len(windows._PERSISTED) - _PIN_BASELINE.get("n", 0)
    assert growth <= 24, f"pin registry grew by {growth} over the sweep"
