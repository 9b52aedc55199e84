"""Approximate-aggregate scale paths: HLL++ distinct and t-digest
percentile must land within their documented error of the exact values."""

from __future__ import annotations

from intellect_bi_spark.operators.relational import approx_distinct_counts


def test_approx_within_bounds(spark, sf_dir):
    r = approx_distinct_counts(spark, sf_dir).first()
    exact, approx = r["exact_customers"], r["approx_customers"]
    assert abs(approx - exact) <= 0.05 * exact
    p50e, p50a = r["exact_p50"], r["approx_p50"]
    # approx_percentile returns an element of the input; allow 2% value gap
    assert abs(p50a - p50e) <= 0.02 * abs(p50e)
