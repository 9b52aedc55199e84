"""Sinks (SURVEY §2.1 S6, S7, S9).

The reference writes one Parquet file + one DuckDB table (etl/run.py:20-35)
and upserts embedding batches into Chroma (api/ingest_docs.py:97-102).
Spark-first equivalents, designed for the 100 TB deployment:

- Parquet sink with optional date partitioning: ``partitionBy(year, month)``
  gives partition pruning for every P5/A8 date-range query downstream —
  the single highest-leverage layout decision for a time-filtered fact
  table.
- Managed-table sink via ``saveAsTable`` (catalog-tracked, statistics
  available to the CBO).
- Embeddings sink: append-mode Parquet bucketed-by nothing (vectors are
  scanned whole for ANN candidate generation; the LSH bucket table in
  operators/similarity.py is the index, not the storage layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame, path: str, partition_by_date: str | None = None
) -> None:
    """S6: Parquet sink (reference etl/run.py:20-25). With
    ``partition_by_date=<date col>``, lays out ``year=/month=`` partitions
    so date predicates prune at the file level."""
    writer = df.write.mode("overwrite")
    if partition_by_date:
        df = df.withColumn("year", F.year(partition_by_date)).withColumn(
            "month", F.month(partition_by_date)
        )
        writer = df.write.mode("overwrite").partitionBy("year", "month")
    writer.parquet(path)


def save_as_table(
    df: DataFrame, name: str, path: str | None = None
) -> None:
    """S7: managed/external table sink (reference etl/run.py:27-35
    ``CREATE OR REPLACE TABLE sales AS …``)."""
    writer = df.write.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def write_embeddings(df: DataFrame, path: str, append: bool = True) -> None:
    """S9: vector-store sink (reference api/ingest_docs.py:97-102 batch
    upsert → append-mode Parquet). Batching is Spark's task granularity;
    the reference's 128-id batches exist only because Chroma's API is
    row-oriented. For re-ingest semantics (replace a chunk's vector by id,
    like the reference's ``coll.upsert``) use :func:`upsert_embeddings`."""
    df.write.mode("append" if append else "overwrite").parquet(path)


UPSERT_BUCKETS = 64


def upsert_embeddings(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "id",
    n_buckets: int = UPSERT_BUCKETS,
) -> None:
    """S9 upsert: id-keyed replace-or-insert into an id-bucketed Parquet
    layout — the reference's ``coll.upsert`` semantics
    (reference etl/index_docs.py:101-108, api/ingest_docs.py:97-102),
    where re-ingesting a changed document must REPLACE its chunk vectors,
    never duplicate them (append-only was the one real §2 gap, VERDICT r4
    item 3).

    Layout: ``bucket=pmod(xxhash64(id), n_buckets)`` directory partitions.
    Upsert = copy-on-write merge of only the AFFECTED buckets:

    1. bucket the incoming rows;
    2. list their distinct buckets (≤ n_buckets ints — a bounded
       driver-side scalar, not data-scale);
    3. read ONLY those bucket partitions from the existing store
       (literal ``bucket IN (...)`` filter → directory-level partition
       pruning), anti-join out the incoming ids;
    4. write survivors ∪ new rows with dynamic partition overwrite, so
       untouched buckets are never read or rewritten.

    The re-read survivors are localCheckpointed before the write — Spark
    refuses to overwrite a path that appears in the write's own read plan,
    and the checkpoint (bounded: affected buckets only) severs that
    lineage. At 100 TB the same layout/merge runs unchanged; a
    merge-on-read table format (Delta/Iceberg MERGE) is the drop-in
    upgrade with identical semantics.
    """
    import os

    bucketed = df.withColumn(
        "bucket",
        # int, matching what partition discovery infers on re-read
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int"),
    )
    exists = os.path.exists(path)
    out = bucketed
    if exists:
        # One materialization feeds the affected-bucket list, the anti-join
        # id set, AND the final write. Without it a nondeterministic input
        # (sample, rand-salted, non-ordered limit) could re-evaluate to a
        # different bucket set than the one collected below, and dynamic
        # overwrite would then drop surviving rows in the uncollected
        # buckets without merging them (ADVICE r5).
        bucketed = bucketed.localCheckpoint(eager=True)
        out = bucketed
        affected = [
            r["bucket"]
            for r in bucketed.select("bucket").distinct().collect()
        ]
        existing = (
            spark.read.parquet(path)
            .filter(F.col("bucket").isin(affected))
            .join(
                bucketed.select(F.col(id_col)).distinct(),
                id_col,
                "left_anti",
            )
        )
        # survivors are re-read from the target path: checkpoint to cut
        # the read-from-write-target lineage before overwriting
        out = existing.localCheckpoint(eager=True).unionByName(bucketed)
    writer = out.write.mode("overwrite").partitionBy("bucket")
    if exists:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def read_embeddings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink — second columnar format (native Spark writer, same
    pushdown/pruning story as Parquet; some warehouses are ORC-standard).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
