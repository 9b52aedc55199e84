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
    row-oriented."""
    df.write.mode("append" if append else "overwrite").parquet(path)


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
