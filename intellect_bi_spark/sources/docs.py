"""Document ingest source (SURVEY §2.1 S8, §2.11 R1-R3, R5).

The reference extracts per-page text from PDF/docx/txt/md files
(etl/index_docs.py:15-32, api/ingest_docs.py:27-43), whitespace-normalizes
(R2), chunks with fixed size/overlap (R3: 800/120 ingest, 1500/200 etl),
embeds, and upserts. Spark-first shape:

- ``binaryFile`` source → (path, modificationTime, length, content).
- Text extraction via ``mapInPandas`` (Arrow-batched): txt/md decode
  in-process; PDF per-page text via pypdf when installed, else the
  vendored pure-stdlib extractor in :mod:`.pdftext`; docx via the stdlib
  zip+XML path. All four formats yield real extracted text — a parse
  failure (encrypted PDF, corrupt zip) degrades to a marker row.
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

from . import pdftext

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

    Page numbers are 1-based like the reference's
    ``enumerate(reader.pages, start=1)`` (etl/index_docs.py:19-22); txt/md
    and docx are a single page 1 (etl/index_docs.py:24-32). PDF uses pypdf
    when present, else the vendored pure-stdlib extractor
    (:mod:`.pdftext`); docx uses the stdlib zip+XML path. A file that fails
    to parse surfaces a diagnostic ``<unextracted:…>`` marker row instead
    of silently dropping.
    """
    try:  # pragma: no cover - not installed here
        from pypdf import PdfReader

        def read_pdf(data: bytes) -> list[tuple[int, str]]:
            import io

            reader = PdfReader(io.BytesIO(data))
            return [
                (i, pg.extract_text() or "")
                for i, pg in enumerate(reader.pages, start=1)
            ]

    except Exception:
        read_pdf = pdftext.extract_pdf_pages
    for pdf_batch in batches:
        out: list[tuple[str, int, str]] = []
        for path, content in zip(pdf_batch["path"], pdf_batch["content"]):
            lower = path.lower()
            data = bytes(content)
            try:
                if lower.endswith((".txt", ".md")):
                    out.append((path, 1, data.decode("utf-8", "replace")))
                elif lower.endswith(".pdf"):
                    out.extend((path, pg, txt) for pg, txt in read_pdf(data))
                elif lower.endswith(".docx"):
                    out.append((path, 1, pdftext.extract_docx_text(data)))
                else:
                    raise ValueError("unsupported extension")
            except Exception:
                out.append((path, 1, f"<unextracted:{path.rsplit('.', 1)[-1]}>"))
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
                else F.lit("p1"),  # pages are 1-based (reference parity)
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
