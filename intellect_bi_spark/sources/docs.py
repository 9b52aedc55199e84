"""Document ingest source (SURVEY §2.1 S8, §2.11 R1-R3, R5).

The reference extracts per-page text from PDF/docx/txt/md files
(etl/index_docs.py:15-32, api/ingest_docs.py:27-43), whitespace-normalizes
(R2), chunks with fixed size/overlap (R3: 800/120 ingest, 1500/200 etl),
embeds, and upserts. Spark-first shape:

- ``binaryFile`` source → (path, modificationTime, length, content).
- Text extraction via ``mapInPandas`` (Arrow-batched): txt/md decode
  in-process; PDF/docx extraction requires libs not in this container, so
  those formats are STUBBED behind an import-try — the Spark plumbing
  (schema, batching, page explosion) is real and tested with txt/md.
- Chunking as sequence→explode over built-in functions (JVM-side, no
  Python) — the same chunker at both reference parameterizations.

At 100 TB: binaryFile splits per-file; millions of small docs should be
repartitioned by hash(path) after extraction so chunk/embed stages get
uniform tasks, which ``ingest_documents`` does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference parameterizations: (size, overlap) chars
CHUNK_INGEST = (800, 120)  # api/ingest_docs.py:12-13
CHUNK_ETL = (1500, 200)  # etl/index_docs.py:34

EXTRACT_SCHEMA = "path string, page int, text string"


def read_binary_docs(spark: SparkSession, path_glob: str) -> DataFrame:
    """S8 scan: binary files with metadata; pushes a pathGlobFilter so
    non-document files are pruned at listing time."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{pdf,txt,md,docx}")
        .load(path_glob)
    )


def _extract_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched extraction: one output row per (file, page).

    txt/md: whole file is page 0. pdf/docx: gated on pypdf / python-docx —
    unavailable in this container, so those rows surface a diagnostic text
    marker instead of silently dropping (the plumbing — schema, explode,
    batch shape — is identical to the real path).
    """
    try:  # pragma: no cover - not installed here
        from pypdf import PdfReader  # noqa: F401

        have_pdf = True
    except Exception:
        have_pdf = False
    for pdf_batch in batches:
        out: list[tuple[str, int, str]] = []
        for path, content in zip(pdf_batch["path"], pdf_batch["content"]):
            lower = path.lower()
            if lower.endswith((".txt", ".md")):
                out.append((path, 0, bytes(content).decode("utf-8", "replace")))
            elif lower.endswith(".pdf") and have_pdf:  # pragma: no cover
                import io

                from pypdf import PdfReader

                reader = PdfReader(io.BytesIO(bytes(content)))
                for i, pg in enumerate(reader.pages):
                    out.append((path, i, pg.extract_text() or ""))
            else:
                out.append((path, 0, f"<unextracted:{path.rsplit('.', 1)[-1]}>"))
        yield pd.DataFrame(out, columns=["path", "page", "text"])


def extract_text(binary_df: DataFrame) -> DataFrame:
    """R1: binary → per-page text rows (mapInPandas, Arrow-batched)."""
    return binary_df.select("path", "content").mapInPandas(
        _extract_pages, schema=EXTRACT_SCHEMA
    )


def normalize_ws(df: DataFrame, col: str = "text") -> DataFrame:
    """R2: ``" ".join(text.split())`` (reference api/ingest_docs.py:47)."""
    return df.withColumn(col, F.trim(F.regexp_replace(col, r"\s+", " ")))


def chunk_text(
    df: DataFrame, size: int, overlap: int, text_col: str = "text"
) -> DataFrame:
    """R3: fixed-size chunking with overlap, slide = size − overlap
    (reference etl/index_docs.py:34-46; trailing short chunk kept, empty
    text yields one empty chunk like ``chunk_text`` on "" → [""]).

    Implemented as sequence→explode over built-ins — a UDTF shape with no
    Python in the hot path.
    """
    step = size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(step),
    )
    return (
        df.withColumn("chunk_start", F.explode(starts))
        .withColumn(
            "chunk",
            F.expr(f"substr({text_col}, chunk_start + 1, {size})"),
        )
        .withColumn(
            "chunk_id",
            F.concat_ws(
                "::",
                F.col("path") if "path" in df.columns else F.lit("doc"),
                F.concat(F.lit("p"), F.col("page"))
                if "page" in df.columns
                else F.lit("p0"),
                F.concat(
                    F.lit("c"), (F.col("chunk_start") / step).cast("int")
                ),
            ),
        )
    )


def ingest_documents(
    spark: SparkSession,
    path_glob: str,
    size: int = CHUNK_INGEST[0],
    overlap: int = CHUNK_INGEST[1],
) -> DataFrame:
    """End-to-end S8+R1+R2+R3: binary scan → extract → normalize → chunk,
    producing (chunk_id, path, page, chunk_start, chunk) — the frame the
    embedder (R4) and vector sink (S9) consume. Chunk IDs mirror the
    reference's ``{fname}::p{page}::c{j}`` (etl/index_docs.py:93)."""
    pages = extract_text(read_binary_docs(spark, path_glob))
    pages = normalize_ws(pages)
    pages = pages.repartition("path")  # uniform tasks for many small files
    return chunk_text(pages, size, overlap).select(
        "chunk_id", "path", "page", "chunk_start", "chunk"
    )
