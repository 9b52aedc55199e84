"""Router unit tests over the reference's own prompt corpus
(reference ui/prompts.txt:1-27 — the de-facto acceptance queries)."""

from __future__ import annotations

import pytest

from intellect_bi_spark.plans.router import route_question

DATA_QUESTIONS = [
    "Which regions have growing sales but declining satisfaction?",
    "What are the top two products for customers under 30?",
    "How did satisfaction change in the North region last quarter?",
    "What month showed the highest overall sales growth?",
    "Are there any correlations between gender and average satisfaction?",
    "How does customer satisfaction compare between each region based on age?",
    "What positive trends are evident in each of the regions?",
    "Compare year-over-year sales performance by quarter.",
    "What is the correlation between transaction value and customer satisfaction?",
    "Rank all products by total revenue, average transaction size, and customer satisfaction.",
    "Analyze the bottom 10% of sales transactions.",
    "Which customer segments (by age, gender, and region) represent the greatest untapped opportunity for revenue growth?",
]

DOC_QUESTIONS = [
    "Summarize the key ideas from the Walmart PDF",
    "How can AI be a core component of value creation in a business model?",
    "What does business intelligence refer to and what are it's ultimate goals?",
]


@pytest.mark.parametrize("q", DATA_QUESTIONS)
def test_data_routes(q):
    assert route_question(q).route == "data", q


@pytest.mark.parametrize("q", DOC_QUESTIONS)
def test_doc_routes(q):
    assert route_question(q).route == "docs", q


def test_empty_defaults_docs():
    assert route_question("").route == "docs"
    assert route_question("   ").route == "docs"


def test_doc_intent_overridden_by_numeric():
    # 'report' is a doc hint, but the numeric/sales cues send it to data
    # (reference api/main.py:252-257).
    assert route_question("report the total sales by region").route == "data"


def test_yoy_quarter_override():
    # annotated '-docs' in the corpus, but the YoY override forces data
    # (reference api/main.py:171-177,259-261).
    q = "Compare year-over-year sales performance by quarter. Which periods showed the strongest growth or decline?"
    r = route_question(q)
    assert r.route == "data" and "YoY" in r.reason
