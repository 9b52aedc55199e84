"""Question router: data path vs document path.

Re-implements the reference's deterministic keyword classifier
(reference api/main.py:237-285 ``wants_sql``; word lists at
api/main.py:96-148,1210-1231) as a pure function. Precedence:

  1) explicit doc intent (unless clearly numeric/sales)
  2) YoY-by-quarter override → data
  3) schema terms → data
  4) numeric cues → data
  5) sales-domain terms → data
  6) BI regex patterns → data
  7) default → docs
"""

from __future__ import annotations

import re
from typing import NamedTuple

SALES_SCHEMA_COLUMNS = (
    "date",
    "region",
    "product",
    "age",
    "gender",
    "sales",
    "satisfaction",
)

NUMERIC_WORDS = (
    "sum", "avg", "average", "median", "min", "max", "total",
    "top", "rank", "trend", "increase", "decrease", "growth", "decline",
    "yoy", "mom", "qoq", "quarter", "month", "weekly", "highest", "lowest",
    "compare", "correlation", "corr", "distribution", "bucket", "percentile",
    "quartile", "std", "variance",
)
NUMERIC_PHRASES = (
    "y/y", "m/m", "q/q", "by region", "by product", "by age", "by gender",
    "segment", "breakdown",
)
SALES_WORDS = (
    "sales", "revenue", "txn", "transaction", "customers", "customer",
    "satisfaction", "nps", "age", "gender", "region", "product",
)
SALES_PHRASES = ("transaction value",)
BI_PATTERNS = (
    r"\b(top|best|worst)\b",
    r"\b(change|delta|difference|improvement|decline)\b",
    r"\b(project|forecast|estimate|predict)\b",
)
DOC_HINTS = (
    "pdf", "document", "doc", "paper", "report", "whitepaper",
    "page ", "section ", "figure ", "table ",
    "summarize", "summary", "key ideas", "key takeaways",
    "according to", "from the pdf", "cite", "citation",
)


class Route(NamedTuple):
    route: str  # "data" | "docs"
    reason: str


def _any_word(q: str, words: tuple[str, ...]) -> bool:
    """Whole-word match (avoids 'sum' hitting 'summarize');
    reference api/main.py:1210-1212."""
    return any(re.search(rf"\b{re.escape(w)}\b", q) for w in words)


def _has_yoy_quarter(q: str) -> bool:
    """YoY-by-quarter questions always go to the data path
    (reference api/main.py:171-177)."""
    has_yoy = any(
        t in q for t in ("year over year", "year-over-year", "yoy", "y-o-y", "y/y")
    )
    has_qtr = "quarter" in q or any(
        t in q for t in ("q1", "q2", "q3", "q4", "quarterly")
    )
    has_sales = any(
        t in q for t in ("sales", "revenue", "amount", "transaction value")
    )
    return has_yoy and has_qtr and has_sales


def route_question(user_q: str) -> Route:
    if not user_q or not user_q.strip():
        return Route("docs", "empty question; default to docs")
    q = user_q.lower().strip()

    if any(h in q for h in DOC_HINTS):
        has_numeric = _any_word(q, NUMERIC_WORDS) or any(
            p in q for p in NUMERIC_PHRASES
        )
        has_sales = _any_word(q, SALES_WORDS) or any(
            p in q for p in SALES_PHRASES
        )
        if not (has_numeric or has_sales):
            return Route("docs", "explicit doc intent detected")

    if _has_yoy_quarter(q):
        return Route("data", "YoY-by-quarter sales intent")

    schema_hits = [c for c in SALES_SCHEMA_COLUMNS if c in q]
    if schema_hits:
        return Route("data", f"schema terms: {', '.join(schema_hits)}")

    if _any_word(q, NUMERIC_WORDS) or any(p in q for p in NUMERIC_PHRASES):
        return Route("data", "numeric/analytic cues")

    if _any_word(q, SALES_WORDS) or any(p in q for p in SALES_PHRASES):
        return Route("data", "sales-domain terms")

    for pat in BI_PATTERNS:
        if re.search(pat, q):
            return Route("data", f"BI pattern: {pat}")

    return Route("docs", "no strong analytic cues; default to docs")
