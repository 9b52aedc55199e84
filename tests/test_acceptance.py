"""End-to-end acceptance over the reference's full 27-prompt corpus
(reference ui/prompts.txt:1-27 — its de-facto acceptance suite, SURVEY §5).

Every prompt must (a) route like the reference, and (b) if data-routed,
compile through the intent layer into an executable DataFrame plan that
returns rows from the fixture data — the whole tier-1/tier-2 lifecycle
(route → parse → compile → execute) with no LLM involved."""

from __future__ import annotations

import pytest

from intellect_bi_spark.plans.intent import answer_question
from intellect_bi_spark.plans.router import route_question

PROMPTS_DATA = [
    "Which regions have growing sales but declining satisfaction?",
    "What are the top two products for customers under 30?",
    "How did satisfaction change in the North region last quarter?",
    "What month showed the highest overall sales growth?",
    "Are there any correlations between gender and average satisfaction?",
    "How does customer satisfaction compare between each region based on age?",
    "What positive trends are evident in each of the regions?",
    "What are the monthly sales trends for each product over the entire time"
    " period? Identify any seasonal patterns or anomalies.",
    "Which product-region combinations generate the highest revenue, and are"
    " there any underperforming combinations that need attention?",
    "Compare year-over-year sales performance by quarter. Which periods"
    " showed the strongest growth or decline?",
    "Analyze customer satisfaction scores across different age groups. Are"
    " there specific age segments that are consistently more or less"
    " satisfied?",
    "What is the relationship between customer age and average purchase"
    " size? Are certain age demographics more valuable?",
    "Compare purchasing patterns and satisfaction levels between male and"
    " female customers across different products and regions.",
    "Rank all products by total revenue, average transaction size, and"
    " customer satisfaction. Which products are the best overall performers?",
    "Identify products with high sales volume but low customer satisfaction"
    " scores. What might explain this discrepancy?",
    "Which regions consistently outperform others in sales, and what factors"
    " might contribute to this success?",
    "Are there regional differences in customer demographics or satisfaction"
    " levels that could inform targeted marketing strategies?",
    "What is the correlation between transaction value and customer"
    " satisfaction? Do higher-value purchases lead to better satisfaction?",
    "Identify the characteristics of transactions with satisfaction scores"
    " below 2.0. What patterns emerge regarding product, region, or customer"
    " demographics?",
    "Which customer segments (by age, gender, and region) represent the"
    " greatest untapped opportunity for revenue growth?",
    "Analyze the bottom 10% of sales transactions. What common factors"
    " contribute to these low-performing sales?",
    "Based on historical patterns, what are the projected sales for the next"
    " quarter by product and region, and where should we allocate additional"
    " resources?",
]

PROMPTS_DOCS = [
    "What are some of the domains that are accepting of time series analysis"
    " and predictions?",
    "Summarize the key ideas from the Walmart PDF",
    "How can AI be a core component of value creation in a business model?",
    "What does business intelligence refer to and what are it's ultimate"
    " goals?",
]


@pytest.mark.parametrize("q", PROMPTS_DATA)
def test_data_prompt_end_to_end(q, spark, sf_dir):
    assert route_question(q).route == "data", q
    df, explanation = answer_question(spark, sf_dir, q)
    assert df.columns, q
    rows = df.limit(50).collect()
    assert len(rows) > 0, f"no rows for: {q}"
    assert explanation


@pytest.mark.parametrize("q", PROMPTS_DOCS)
def test_docs_prompt_routes_docs(q):
    assert route_question(q).route == "docs", q
