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


def test_sketch_delete_mid_state_per_day_visibility(spark, sf_dir):
    """The sketch store's DOCUMENTED weaker visibility contract
    (VERDICT r14 #3, option B — see delete_users_from_sketch_store's
    docstring): the erasure recompute is read-committed PER DAY, not
    snapshot-isolated.  This unit constructs the exact transitional
    state a mid-delete reader can observe — the first affected day's
    partition already rewritten (the same dynamic-overwrite commit the
    full delete issues per day), the rest not yet — and demonstrates
    the contract honestly: (a) per-day atomicity holds — every day's
    cells equal EITHER the pre-delete or the post-delete rollup of
    that day, never torn state; (b) the global cut is absent — the
    transitional cell relation matches neither the full pre-delete nor
    the full post-delete store; (c) completing the delete converges to
    the rebuild-without-users state."""
    ev = _events(spark, sf_dir)
    pred = sk._del_users_pred()
    tmp = tempfile.mkdtemp(prefix="sgraft_skmid_")
    tmp2 = tempfile.mkdtemp(prefix="sgraft_skmid_rebuild_")
    try:
        sk.build_sketch_rollup_store(spark, sf_dir, tmp)
        pre = _cells(spark, tmp)
        # the post-delete truth: rollup of survivors only
        surv = ev.filter(~pred)
        sk.user_sketch_rollup(surv).withColumn(
            "day_part", F.col("day").cast("string")
        ).write.partitionBy("day_part").parquet(f"{tmp2}/rollup")
        post = _cells(spark, tmp2)
        affected = sorted(
            str(r["day"])
            for r in ev.filter(pred)
            .select(F.expr("CAST(ts AS DATE)").alias("day"))
            .distinct()
            .collect()
        )
        assert len(affected) > 1  # a mid-state needs at least two days
        first = affected[0]
        # commit ONLY the first affected day — the per-day write the
        # full delete's loop issues
        day_surv = surv.filter(
            F.expr("CAST(ts AS DATE)").cast("string") == first
        )
        (
            sk.user_sketch_rollup(day_surv)
            .withColumn("day_part", F.col("day").cast("string"))
            .repartition(1, "day_part")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day_part")
            .parquet(f"{tmp}/rollup")
        )
        mid = _cells(spark, tmp)
        # (a) per-day atomicity: each day is wholly pre or wholly post
        days = {d for d, _ in mid}
        for d in days:
            day_cells = {k: v for k, v in mid.items() if k[0] == d}
            pre_day = {k: v for k, v in pre.items() if k[0] == d}
            post_day = {k: v for k, v in post.items() if k[0] == d}
            assert day_cells in (pre_day, post_day), f"{d}: torn day"
        assert {k: v for k, v in mid.items() if k[0] == first} == {
            k: v for k, v in post.items() if k[0] == first
        }
        # (b) no global cut: the transitional state is neither snapshot
        assert mid != pre and mid != post
        # (c) completing the delete converges to the rebuild
        assert sorted(
            sk.delete_users_from_sketch_store(spark, tmp, ev, pred)
        ) == affected
        assert _cells(spark, tmp) == post
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
