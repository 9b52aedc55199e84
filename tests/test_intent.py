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
