"""Incremental sketch-store maintenance (sketch_rollup_upsert): the
cell-level upsert ≡ rebuild claim and the file-level append-only claim
— the two properties the aggregate parity row implies but should be
locked directly (the vectorstore/retrieval upsert discipline)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from intellect_bi_spark.catalog import load_tables
from intellect_bi_spark.operators import sketches as sk


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"].filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )


def _cells(spark, path):
    """(day_part, event_type) → (estimate, n_events) from a store."""
    return {
        (r["day_part"], r["event_type"]): (r["est"], r["n_events"])
        for r in spark.read.parquet(f"{path}/rollup")
        .groupBy("day_part", "event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }


def _day_dirs(path):
    return {
        d: sorted(os.listdir(os.path.join(path, "rollup", d)))
        for d in os.listdir(os.path.join(path, "rollup"))
        if d.startswith("day_part=")
    }


def test_sketch_upsert_cells_equal_full_rebuild(spark, sf_dir):
    ev = _events(spark, sf_dir)
    is_batch = F.dayofmonth(F.expr("CAST(ts AS DATE)")) % 7 == 3
    up_tmp = tempfile.mkdtemp(prefix="sgraft_skup_")
    rb_tmp = tempfile.mkdtemp(prefix="sgraft_skrb_")
    try:
        sk.user_sketch_rollup(ev.filter(~is_batch)).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.partitionBy("day_part").parquet(f"{up_tmp}/rollup")
        sk.user_sketch_rollup(ev.filter(is_batch)).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.mode("append").partitionBy("day_part").parquet(
            f"{up_tmp}/rollup"
        )
        sk.build_sketch_rollup_store(spark, sf_dir, rb_tmp)
        assert _cells(spark, up_tmp) == _cells(spark, rb_tmp)
        # and the served per-type merge agrees too
        up = sorted(
            (r["event_type"], r["est"], r["n_events"])
            for r in sk.serve_sketch_rollup_from_store(
                spark, up_tmp
            ).collect()
        )
        rb = sorted(
            (r["event_type"], r["est"], r["n_events"])
            for r in sk.serve_sketch_rollup_from_store(
                spark, rb_tmp
            ).collect()
        )
        assert up == rb
    finally:
        shutil.rmtree(up_tmp, ignore_errors=True)
        shutil.rmtree(rb_tmp, ignore_errors=True)


def test_sketch_upsert_appends_only_batch_days(spark, sf_dir):
    ev = _events(spark, sf_dir)
    is_batch = F.dayofmonth(F.expr("CAST(ts AS DATE)")) % 7 == 3
    tmp = tempfile.mkdtemp(prefix="sgraft_skupf_")
    try:
        sk.user_sketch_rollup(ev.filter(~is_batch)).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.partitionBy("day_part").parquet(f"{tmp}/rollup")
        before = _day_dirs(tmp)
        sizes = {
            (d, f): os.path.getsize(os.path.join(tmp, "rollup", d, f))
            for d, fs in before.items()
            for f in fs
        }
        batch_days = {
            f"day_part={r['d']}"
            for r in ev.filter(is_batch)
            .select(F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("d"))
            .distinct()
            .collect()
        }
        assert batch_days and not (batch_days & set(before))
        sk.user_sketch_rollup(ev.filter(is_batch)).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.mode("append").partitionBy("day_part").parquet(
            f"{tmp}/rollup"
        )
        after = _day_dirs(tmp)
        assert set(after) == set(before) | batch_days
        for d, fs in before.items():
            assert after[d] == fs, f"{d}: pre-existing partition changed"
            for f in fs:
                assert (
                    os.path.getsize(os.path.join(tmp, "rollup", d, f))
                    == sizes[(d, f)]
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sketch_delete_equals_rebuild_without_users(spark, sf_dir):
    """Deletion through the sketch store: after erasing the user set,
    the cell relation equals a from-scratch rollup of ONLY the
    surviving events (same estimates, same exact counts per cell), and
    day partitions holding no erased-user events are byte-untouched."""
    ev = _events(spark, sf_dir)
    pred = sk._del_users_pred()
    tmp = tempfile.mkdtemp(prefix="sgraft_skdel_")
    tmp2 = tempfile.mkdtemp(prefix="sgraft_skdel_rebuild_")
    try:
        sk.build_sketch_rollup_store(spark, sf_dir, tmp)
        before_dirs = _day_dirs(tmp)
        sizes = {
            (d, f): os.path.getsize(os.path.join(tmp, "rollup", d, f))
            for d, fs in before_dirs.items()
            for f in fs
        }
        affected = sk.delete_users_from_sketch_store(spark, tmp, ev, pred)
        assert affected  # ~10% of users must touch some day
        affected_dirs = {f"day_part={d}" for d in affected}
        after_dirs = _day_dirs(tmp)
        for d in after_dirs:
            if d not in affected_dirs:
                assert after_dirs[d] == before_dirs[d], f"{d}: changed"
                for f in before_dirs[d]:
                    assert (
                        os.path.getsize(os.path.join(tmp, "rollup", d, f))
                        == sizes[(d, f)]
                    ), f"{d}/{f}: untouched day rewritten"
        # cell relation == rebuild over survivors only
        surv = ev.filter(~pred)
        sk.user_sketch_rollup(surv).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.partitionBy("day_part").parquet(f"{tmp2}/rollup")
        assert _cells(spark, tmp) == _cells(spark, tmp2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(tmp2, ignore_errors=True)


def test_sketch_stream_composes_to_single_pass_build(spark, sf_dir):
    """The streaming append chain: per-batch markers land, redelivery
    is a no-op, and the stream-composed store SERVES exactly what the
    single-pass build serves — partial-day cells from different batches
    merge losslessly (union associativity over max-register HLL)."""
    from intellect_bi_spark.operators import retrieval as rt

    ev = _events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="sgraft_skstream_")
    tmp2 = tempfile.mkdtemp(prefix="sgraft_skstream_build_")
    try:
        sk._run_sketch_upsert_stream(spark, sf_dir, tmp)
        store = f"{tmp}/store"
        for bid in range(rt.N_FEED_FILES):
            assert os.path.isdir(f"{store}/_batches/bid={bid}")
        sk.build_sketch_rollup_store(spark, sf_dir, tmp2)

        def served(path):
            return sorted(
                (r["event_type"], r["est"], r["n_events"])
                for r in sk.serve_sketch_rollup_from_store(
                    spark, path
                ).collect()
            )

        got = served(store)
        assert got == served(tmp2)
        # exact accounting reached the store losslessly
        n_ev = ev.count()
        assert sum(n for _t, _e, n in got) == n_ev
        # redelivery of an applied batch id must change nothing
        rows_before = spark.read.parquet(f"{store}/rollup").count()
        sk._sketch_stream_sink(store, ev.limit(50), 0)
        assert spark.read.parquet(f"{store}/rollup").count() == rows_before
        assert served(store) == got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(tmp2, ignore_errors=True)
