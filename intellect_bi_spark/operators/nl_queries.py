"""Natural-language questions compiled end-to-end through the intent
compiler (plans/intent.py) and verified against DuckDB oracles — the
driver-gated proof that routing + parsing + plan compilation reproduce the
reference's tier-2 behavior (reference api/main.py:1336-1358) on real
questions from its own prompt corpus (reference ui/prompts.txt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import sales_cte, sales_txn_cte, sales_with_txn
from ..functions.numeric import corr_sql, davg_sql, dsum_sql
from ..plans.intent import answer_question
from ..plans.router import route_question

_QUESTIONS = {
    "nl_yoy_quarter": "Compare year-over-year sales performance by quarter.",
    "nl_last2_quarters_by_region": (
        "Show average satisfaction for the two most recent quarters by region"
    ),
    "nl_monthly_sales_north": (
        "What is the monthly sales trend in the North region?"
    ),
    "nl_correlation": (
        "What is the correlation between transaction value and customer"
        " satisfaction?"
    ),
    "nl_qoq_delta": "How did sales change compared to last quarter?",
}


def _nl(name: str):
    question = _QUESTIONS[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        route = route_question(question)
        assert route.route == "data", f"router sent {name!r} to docs"
        df, _template = answer_question(spark, sf_dir, question)
        return df

    run.__name__ = name
    run.__doc__ = f"NL-compiled: {question!r}"
    return run


_TXN_QUESTION = (
    "What is the monthly transaction value trend in the North region?"
)


def nl_transaction_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NL question naming the reference's OPTIONAL ``transaction_value``
    column, answered against a view that actually carries it — exercising
    the _col-style schema resolution end to end (reference api/main.py:789
    advertises the column; :1010-1017 synonym-maps it; intent.py
    resolve_metric_column binds it). The same question on the canonical
    view aggregates ``sales`` — that path stays covered by the other nl_*
    rows."""
    route = route_question(_TXN_QUESTION)
    assert route.route == "data", "router sent the txn question to docs"
    df, template = answer_question(
        spark, sf_dir, _TXN_QUESTION, view=sales_with_txn(spark, sf_dir)
    )
    assert template == "grain_groupby", template
    return df


QUERIES = {name: _nl(name) for name in _QUESTIONS}
QUERIES["nl_transaction_value"] = nl_transaction_value

_QTR = "CAST(date_trunc('quarter', date) AS DATE)"

ORACLES = {
    "nl_yoy_quarter": sales_cte(
        f", agg AS (SELECT CAST(EXTRACT(YEAR FROM date) AS INT) AS year,"
        f" CAST(EXTRACT(QUARTER FROM date) AS INT) AS quarter,"
        f" {dsum_sql('sales')} AS total FROM sales GROUP BY 1, 2)"
        f" SELECT a.year, a.quarter, a.total,"
        f" a.total - b.total AS yoy_delta"
        f" FROM agg a LEFT JOIN agg b"
        f" ON b.quarter = a.quarter AND b.year = a.year - 1"
    ),
    "nl_last2_quarters_by_region": sales_cte(
        f", last2 AS (SELECT {_QTR} AS qtr FROM sales GROUP BY 1"
        f" ORDER BY qtr DESC LIMIT 2)"
        f" SELECT {_QTR} AS period, region,"
        f" {davg_sql('satisfaction')} AS value FROM sales"
        f" WHERE {_QTR} IN (SELECT qtr FROM last2)"
        f" GROUP BY 1, region"
    ),
    "nl_monthly_sales_north": sales_cte(
        f"SELECT CAST(date_trunc('month', date) AS DATE) AS period, region,"
        f" {dsum_sql('sales')} AS value FROM sales"
        f" WHERE region = 'North' GROUP BY 1, 2"
    ),
    "nl_correlation": sales_cte(
        f"SELECT {corr_sql('sales', 'satisfaction')} AS corr_coef FROM sales"
    ),
    "nl_transaction_value": sales_txn_cte(
        f"SELECT CAST(date_trunc('month', date) AS DATE) AS period, region,"
        f" {dsum_sql('transaction_value', 4)} AS value FROM sales_txn"
        f" WHERE region = 'North' GROUP BY 1, 2"
    ),
    "nl_qoq_delta": sales_cte(
        f", base AS (SELECT {_QTR} AS qtr, {dsum_sql('sales')} AS val"
        f" FROM sales GROUP BY 1),"
        f" g AS (SELECT qtr, val, LAG(val) OVER (ORDER BY qtr) AS"
        f" prev_qtr_value FROM base)"
        f" SELECT val AS current_qtr_value, prev_qtr_value,"
        f" val - prev_qtr_value AS delta FROM g"
        f" ORDER BY qtr DESC LIMIT 1"
    ),
}
