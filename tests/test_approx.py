"""Approximate-aggregate scale paths: HLL++ distinct and t-digest
percentile must land within their documented error of the exact values.

The query is self-checking (the in-bounds comparison runs inside Spark and
is emitted as integer flags with an exact oracle); this test asserts the
flags actually came back 1 so a sketch regression fails loudly here too.
"""

from __future__ import annotations

from intellect_bi_spark.operators.relational import approx_distinct_counts


def test_approx_within_bounds(spark, sf_dir):
    r = approx_distinct_counts(spark, sf_dir).first()
    assert r["exact_customers"] > 0
    assert r["approx_customers_in_bounds"] == 1
    assert r["approx_p50_in_bounds"] == 1
