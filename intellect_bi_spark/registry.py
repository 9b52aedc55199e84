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
    forecast,
    inventory,
    multimodal,
    nl_queries,
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
    textops,
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
