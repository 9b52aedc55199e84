"""Driver-side result/context formatting (SURVEY §2.11 R7-R9).

These are API-boundary string operators — they run on collected rows, not
on DataFrames (the reference does the same: api/main.py:987-1002,
1429-1440). Pure functions with exact reference semantics so the LLM
orchestration layer (external per the charter) can consume our results the
same way it consumes the reference's.
"""

from __future__ import annotations

import textwrap
from typing import Any

SNIPPET_WIDTH = 700  # reference api/main.py:1433
TRUNCATE_MIN_PARA = 400  # api/main.py:989 keeps the cut only if > 400
MARKDOWN_MAX_ROWS = 8  # api/main.py:995


def truncate_chars(s: str, limit: int) -> str:
    """R8: cut at the last paragraph break before ``limit`` — but only when
    that break is past char 400, else hard-cut (reference
    api/main.py:987-990)."""
    if len(s) <= limit:
        return s
    cut = s[:limit]
    last_para = cut.rfind("\n\n")
    return cut[: last_para if last_para > TRUNCATE_MIN_PARA else limit]


def rows_to_markdown(
    rows: list[tuple], headers: list[str], max_rows: int = MARKDOWN_MAX_ROWS
) -> str:
    """R9: result table → markdown capped at ``max_rows`` (reference
    api/main.py:995-1002; NULL renders empty)."""
    if not rows:
        return ""
    hdr = "| " + " | ".join(headers) + " |\n"
    sep = "| " + " | ".join("---" for _ in headers) + " |\n"
    body = ""
    for r in rows[:max_rows]:
        body += (
            "| "
            + " | ".join("" if v is None else str(v) for v in r)
            + " |\n"
        )
    return hdr + sep + body


def assemble_context(
    docs: list[str], metas: list[dict[str, Any]]
) -> tuple[str, list[dict[str, Any]]]:
    """R7: numbered context lines (whitespace-normalized, shortened to 700
    chars) + citation records (reference api/main.py:1429-1440)."""
    context_lines: list[str] = []
    citations: list[dict[str, Any]] = []
    for i, (d, m) in enumerate(zip(docs, metas), start=1):
        excerpt = " ".join((d or "").split())
        excerpt = textwrap.shorten(
            excerpt, width=SNIPPET_WIDTH, placeholder=" …"
        )
        context_lines.append(f"[{i}] {excerpt}")
        citations.append(
            {
                "index": i,
                "source": m.get("source"),
                "page": m.get("page"),
                "chunk": m.get("chunk"),
            }
        )
    return "\n".join(context_lines), citations


def df_to_result_dict(df) -> dict[str, Any]:
    """The reference's result envelope ``{"headers": [...], "rows": [...]}``
    (api/main.py:302-307) from a DataFrame — collect happens HERE, at the
    API boundary, never inside an operator."""
    rows = df.collect()
    return {
        "headers": list(df.columns),
        "rows": [list(r) for r in rows],
    }
