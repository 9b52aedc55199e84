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


def test_hll_rollup_merge_equals_direct_sketch(spark, sf_dir):
    """The property the sketch-rollup pattern rests on: merging the
    per-(day, type) sketches must estimate the same cardinality as
    sketching the raw rows directly — pre-aggregation loses nothing."""
    from pyspark.sql import functions as F

    from intellect_bi_spark.catalog import load_tables
    from intellect_bi_spark.operators.sketches import (
        _HLL_LGK,
        user_sketch_rollup,
    )

    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    merged = {
        r["day"]: r["est"]
        for r in user_sketch_rollup(ev)
        .groupBy("day")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()
    }
    # direct sketch at the SAME lgConfigK as the rollup (r8 review: with
    # the default lgK=12 here, merge==direct would only hold while both
    # sketches stay in exact sparse mode — true at fixture cardinality,
    # silently false at scale)
    direct = {
        r["day"]: r["est"]
        for r in ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(
            F.expr(
                "hll_sketch_estimate("
                f"hll_sketch_agg(user_id, {_HLL_LGK}))"
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct and len(direct) > 10


def test_sketch_bytes_survive_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The property sketch_rollup_store certifies, isolated: HLL sketch
    blobs written to parquet and read back must merge to EXACTLY the
    estimates the in-memory union produces (byte-level survival, not
    just in-bounds)."""
    from pyspark.sql import functions as F

    from intellect_bi_spark.catalog import load_tables
    from intellect_bi_spark.operators.sketches import user_sketch_rollup

    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    rollup = user_sketch_rollup(ev)
    path = str(tmp_path / "rollup")
    rollup.write.parquet(path)
    agg = [
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.sum("n_events").alias("n"),
    ]
    direct = {
        r["event_type"]: (r["est"], r["n"])
        for r in rollup.groupBy("event_type").agg(*agg).collect()
    }
    stored = {
        r["event_type"]: (r["est"], r["n"])
        for r in spark.read.parquet(path).groupBy("event_type").agg(*agg).collect()
    }
    assert stored == direct and len(stored) > 0


def test_sq8_reconstruction_error_bounded_and_recall(spark, sf_dir):
    """SQ8 quality properties, beyond the bit-exact oracle parity:
    (1) every dequantized value sits within half a quantization step of
    the original (the defining property of round-to-nearest min-max
    scalar quantization); (2) the ADC top-10 recalls most of the exact
    top-10 at 64 dims (sanity floor 0.6 — typically 0.9+)."""
    from pyspark.sql import functions as F

    from intellect_bi_spark.operators import similarity as sim

    deq = sim._sq8_codes(spark, sf_dir).withColumn(
        "deq", F.expr(sim._SQ8_DEQ_EXPR)
    )
    err = deq.select(
        F.posexplode(
            F.expr(
                "zip_with(embedding, deq,"
                " (x, y) -> abs(CAST(x AS DOUBLE) - y))"
            )
        ).alias("d", "abs_err"),
    ).join(
        deq.select(
            F.posexplode(
                F.expr(
                    "zip_with(lo_arr, hi_arr,"
                    f" (l, h) -> (h - l) / {sim.SQ_LEVELS}.0 / 2.0)"
                )
            ).alias("d", "half_step")
        ).distinct(),
        "d",
    )
    # tiny numeric headroom for the float32->double cast of the source
    viol = err.filter(F.col("abs_err") > F.col("half_step") + 1e-9).count()
    assert viol == 0
    exact = {r["vec_id"] for r in sim.cosine_topk(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in sim.ann_topk_sq8(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
