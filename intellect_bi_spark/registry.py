"""Query registry: merges every operator module's QUERIES / ORACLES.

This is the engine's public contract (`__spark_entry__.py` re-exports it):
one named declarative query per implemented SURVEY.md §2 operator, each with
a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup,
    eventops,
    forecast,
    inventory,
    multimodal,
    nl_queries,
    pipeline,
    relational,
    sales_queries,
    similarity,
    streamops,
    temporal,
    textops,
)

# Ordered so the driver's budgeted correctness sweep verifies the reference
# sales surface first (round-1 lesson: expensive high-output modules at the
# front exhausted the check budget before sales_queries ever ran —
# CORRECTNESS_r01 stopped at 49/90). Cheap reference-parity modules lead;
# the heavy charter extensions (dedup candidates, multimodal UDF scans)
# come last, and their outputs are aggregate checksums rather than full
# dumps (see dedup.py / multimodal.py).
_MODULES = (
    sales_queries,
    nl_queries,
    relational,
    inventory,
    temporal,
    eventops,
    textops,
    pipeline,
    streamops,
    similarity,
    forecast,
    dedup,
    multimodal,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        assert _name not in QUERIES, f"duplicate query name: {_name}"
        QUERIES[_name] = _fn
    ORACLES.update(getattr(_mod, "ORACLES", {}))

# The driver's correctness sweep checks the first 50 registry entries per
# round.  Round 3 certified the 50 then-uncertified entries (a clean sweep —
# CORRECTNESS_r03 is 50/50 green).  The round-4 front is, in priority order:
# (a) queries NEW this round (pipeline corpus-prep module, q7/q13/q22
#     join shapes, sliding/replay-dedup streaming twins, batch ANN,
#     near-dup clustering, event funnel/retention/rollup analytics);
# (b) queries whose CODE changed after r3's sweep ran — the lag_stitched
#     window refactor (mom_growth/qoq/o2/nl_qoq), the TIMESTAMP_NTZ
#     compatibility fixes (temporal + streaming twins), and the forecast
#     seed-selection refactor (ma/seasonal7/drift) — their r3 rows predate
#     the current code;
# (c) the r2-certified sales/NL/relational surface that r3's rotation
#     crowded out.  The entries left past position 50 are unchanged
#     trivial micro-queries (p1-p8, a4/a9/a10, o3/a12/w3/j2) with green r2
#     rows.  Locally, all queries are continuously verified against the
#     same oracles by tests/test_parity.py.
_FRONT = (
    # -- (a) new this round --------------------------------------------------
    "train_test_split_stats",
    "stratified_sample_by_lang",
    "decontam_ngram_overlap",
    "corpus_token_histogram",
    "q7_nation_volume",
    "q13_order_count_distribution",
    "q22_dormant_customers",
    "events_sliding_daily",
    "events_dedup_replay",
    "token_familiarity_scores",
    "skew_profile_orders_custkey",
    "ann_topk_batch",
    "near_dup_clusters",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "events_rollup_merge",
    # -- (b) code changed after the r3 sweep ---------------------------------
    "mom_growth_top_month",
    "qoq_delta",
    "nl_qoq_delta",
    "o2_nulls_last",
    "asof_join_clicks",
    "range_join_click_bursts",
    "events_tumbling_daily",
    "events_sessionize",
    "forecast_ma",
    "forecast_seasonal7",
    "forecast_drift",
    # -- (c) r2-certified surface, crowded out of r3 -------------------------
    "kpi_overview",
    "top_region",
    "top_product",
    "top_products_under_30",
    "region_trends_monthly",
    "yoy_quarter",
    "region_divergence",
    "corr_sales_satisfaction",
    "sales_daily",
    "last_two_quarters_satisfaction",
    "gender_satisfaction",
    "region_quarter_delta",
    "nl_yoy_quarter",
    "nl_last2_quarters_by_region",
    "nl_monthly_sales_north",
    "nl_correlation",
    "q1_pricing_summary",
    "revenue_by_region",
    "orders_by_status",
    "events_rolling_7d",
    "q4_order_priority",
    "q18_large_orders",
    "approx_distinct_counts",
)

# Integrity checks raise explicitly (not ``assert``) so they survive
# ``python -O`` — the _FRONT list is hand-maintained and a silent skip
# would let a typo quietly drop a query from the driver sweep.
if len(_FRONT) != len(set(_FRONT)):
    raise ValueError("duplicate name in _FRONT")
_missing = [n for n in _FRONT if n not in QUERIES]
if _missing:
    raise ValueError(f"_FRONT names not in registry: {_missing}")
_front_set = set(_FRONT)
QUERIES = {
    **{n: QUERIES[n] for n in _FRONT},
    **{n: f for n, f in QUERIES.items() if n not in _front_set},
}
