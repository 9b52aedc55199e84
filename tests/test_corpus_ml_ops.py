"""Plan + semantic locks for the round-8 corpus-ML operators: k-means,
BM25 retrieval, fuzzy matching, group-aware split, MV maintenance.
Correctness vs the DuckDB oracles is covered by test_parity.py; these
tests pin the SCALE-RELEVANT shapes (broadcast model, no joins in the
assignment pass, top-k physical operator) and the invariants the
oracles state only implicitly."""

from __future__ import annotations

import contextlib
import io

from intellect_bi_spark.operators.clustering import (
    K,
    kmeans_embedding_clusters,
)
from intellect_bi_spark.operators.dedup import group_aware_split_stats
from intellect_bi_spark.operators.maintenance import mv_incremental_orders
from intellect_bi_spark.operators.retrieval import (
    QUERY_TERMS,
    bm25_topk_docs,
    fuzzy_name_match_summary,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_kmeans_assignment_is_map_side(spark, sf_dir):
    """The Lloyd assignment must be a pure projection: the model is
    inlined, so the final plan may contain aggregation exchanges but NO
    join of any kind (a join here would mean the centroids travel as a
    relation and the assignment shuffles the corpus)."""
    plan = plan_of(kmeans_embedding_clusters(spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_partitions_points(spark, sf_dir):
    df = kmeans_embedding_clusters(spark, sf_dir)
    rows = df.collect()
    assert 1 <= len(rows) <= K
    total = sum(r["n_points"] for r in rows)
    from intellect_bi_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["embeddings"].count()
    assert total == n  # every point assigned exactly once
    assert all(r["inertia_q"] >= 0 for r in rows)


def test_bm25_broadcasts_statistics_and_takes_topk(spark, sf_dir):
    plan = plan_of(bm25_topk_docs(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # |Q|-row term stats
    assert "BroadcastNestedLoopJoin" in plan  # 1-row corpus stats
    assert "SortMergeJoin" not in plan  # postings never shuffle for stats
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_bm25_hit_terms_bounded_by_query(spark, sf_dir):
    rows = bm25_topk_docs(spark, sf_dir).collect()
    assert rows, "fixture corpus must match the query"
    assert all(1 <= r["n_hit_terms"] <= len(QUERY_TERMS) for r in rows)
    assert all(r["score_q"] > 0 for r in rows)
    scores = [r["score_q"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_fuzzy_match_candidates_bound_matches(spark, sf_dir):
    row = fuzzy_name_match_summary(spark, sf_dir).collect()[0]
    assert 0 <= row["n_matches"] <= row["n_candidates"]
    assert row["impact"] >= row["n_matches"]  # freqs ≥ 1


def test_group_aware_split_never_leaks(spark, sf_dir):
    rows = group_aware_split_stats(spark, sf_dir).collect()
    assert rows
    assert all(r["n_leaked_pairs"] == 0 for r in rows)
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_mv_merge_monotone_cells(spark, sf_dir):
    rows = mv_incremental_orders(spark, sf_dir).collect()
    assert rows
    assert all(r["n_orders"] >= 1 for r in rows)
    months = [(r["month"], r["status"]) for r in rows]
    assert len(months) == len(set(months))  # merge never splits a cell


def test_pagerank_mass_and_order(spark, sf_dir):
    from intellect_bi_spark.operators.graph import (
        BASE,
        Q,
        trade_pagerank_nations,
    )

    rows = trade_pagerank_nations(spark, sf_dir).collect()
    assert rows
    # every nation present, ranked field bounded below by the base mass
    assert all(r["rank_q"] >= BASE for r in rows)
    ranks = [r["rank_q"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # fixed-point total mass stays within damping bounds (≤ n·Q: floor
    # losses only shrink it)
    assert sum(ranks) <= len(rows) * Q


def test_domain_mix_budgets_respected(spark, sf_dir):
    from intellect_bi_spark.operators.pipeline import domain_mix_selection

    rows = domain_mix_selection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["tokens_selected"] <= r["tokens_target"]
        assert r["n_selected"] <= r["n_docs"]
        assert r["tokens_target"] <= r["tokens_total"]


def test_snapshot_diff_partitions_key_space(spark, sf_dir):
    from intellect_bi_spark.operators.maintenance import (
        snapshot_diff_orders,
    )
    from intellect_bi_spark.catalog import load_tables

    r = snapshot_diff_orders(spark, sf_dir).collect()[0]
    assert r["n_added"] > 0 and r["n_removed"] > 0 and r["n_changed"] > 0
    n = load_tables(spark, sf_dir)["orders"].count()
    # every order key lands in exactly one class, except the keys absent
    # from BOTH snapshots (insert-slice ∩ delete-slice)
    classified = (
        r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
    )
    assert classified <= n
    assert classified >= n - n // 19  # both-absent keys are < 1/19 of keys


def test_sketch_sliding_gap_uses_calendar_window(spark):
    """A gapped day spine must NOT widen the merge window: the day after
    a 9-day gap may only see itself (review r8 finding — a ROWS frame
    would merge the 7 most recent PRESENT days instead).  At these tiny
    cardinalities the HLL estimate is exact, so equality is safe."""
    import datetime

    from pyspark.sql import functions as F

    from intellect_bi_spark.operators.sketches import (
        _HLL_LGK,
        _sliding_union_est,
    )

    d0 = datetime.date(2024, 1, 1)
    rows = (
        [(d0, u) for u in range(5)]
        + [(d0 + datetime.timedelta(days=1), u) for u in range(5, 8)]
        + [(d0 + datetime.timedelta(days=10), u) for u in range(8, 10)]
    )
    daily_sk = (
        spark.createDataFrame(rows, "day date, user_id long")
        .groupBy("day")
        .agg(F.expr(f"hll_sketch_agg(user_id, {_HLL_LGK})").alias("sk"))
    )
    est = {
        r["day"]: int(r["est"])
        for r in _sliding_union_est(daily_sk).collect()
    }
    assert est[d0] == 5
    assert est[d0 + datetime.timedelta(days=1)] == 8  # day 0 ∪ day 1
    # the post-gap day is alone in its calendar window
    assert est[d0 + datetime.timedelta(days=10)] == 2
