"""Intent-compiler unit tests (SURVEY §2.9 C1-C6)."""

from __future__ import annotations

from intellect_bi_spark.plans.intent import Intent, parse_intent

DISTINCTS = {
    "region": ["Central", "East", "North", "South", "West"],
    "product": ["Brand#11", "Brand#12"],
    "gender": ["Female", "Male"],
}


def test_metric_detection():
    assert parse_intent("average satisfaction by region").metric == "satisfaction"
    assert parse_intent("average satisfaction by region").agg == "AVG"
    assert parse_intent("total revenue by product").metric == "sales"
    assert parse_intent("sales trend").agg == "SUM"
    # trend words default to sales (reference api/main.py:366-368)
    assert parse_intent("what is the growth this year").metric == "sales"


def test_timegrain_detection():
    assert parse_intent("monthly sales").timegrain == "month"
    assert parse_intent("sales per quarter").timegrain == "quarter"
    assert parse_intent("annual revenue").timegrain == "year"
    assert parse_intent("sales by product").timegrain == ""


def test_compare_detection():
    assert parse_intent("sales last quarter").compare == ("quarter", "last")
    assert parse_intent(
        "satisfaction for the two most recent quarters"
    ).compare == ("quarter", "last2")
    assert parse_intent("yoy sales by quarter").compare == ("year", "yoy")


def test_dimension_and_filter_binding():
    it = parse_intent("monthly sales trend in the North region", DISTINCTS)
    assert "region" in it.dims
    assert it.filters == {"region": "North"}


def test_filter_binding_case_insensitive_token():
    it = parse_intent("how are sales in north?", DISTINCTS)
    assert it.filters == {"region": "North"}


def test_correlation_trigger():
    it = parse_intent(
        "correlation between transaction value and satisfaction"
    )
    assert it.is_correlation


def test_age_is_filter_dim_only():
    it = parse_intent("sales by age and region", DISTINCTS)
    assert "age" in it.dims  # detected
    # compile_intent drops it from group-by dims (numeric dim)


def test_metric_resolution_prefers_optional_txn_column():
    """_col semantics (reference api/main.py:376,1010-1017): the sales
    metric binds to transaction_value only when the view carries it."""
    from intellect_bi_spark.plans.intent import resolve_metric_column

    base_cols = ["date", "product", "region", "sales", "satisfaction"]
    assert resolve_metric_column(base_cols, "sales") == "sales"
    assert (
        resolve_metric_column(base_cols + ["transaction_value"], "sales")
        == "transaction_value"
    )
    assert resolve_metric_column(base_cols, "satisfaction") == "satisfaction"


def test_txn_view_answers_transaction_value_questions(spark, sf_dir):
    """End-to-end: the same question answers from transaction_value on the
    txn-bearing view and from sales on the canonical view, with different
    values (the optional column is a genuinely distinct quantity)."""
    from intellect_bi_spark.catalog import sales_with_txn
    from intellect_bi_spark.plans.intent import answer_question

    q = "total monthly transaction value"
    txn_df, _ = answer_question(
        spark, sf_dir, q, view=sales_with_txn(spark, sf_dir)
    )
    base_df, _ = answer_question(spark, sf_dir, q)
    txn = {r["period"]: r["value"] for r in txn_df.collect()}
    base = {r["period"]: r["value"] for r in base_df.collect()}
    assert set(txn) == set(base)  # same periods
    assert any(abs(txn[p] - base[p]) > 1e-6 for p in txn)  # different metric
