"""JSONL (newline-delimited JSON) source — the interchange format most
training-data drops arrive in (one document/event per line).

The reference ingests CSV and documents only (SURVEY §2.1); JSONL is the
charter's forward-looking source. Spark's native ``spark.read.json`` is a
distributed line-splittable scan — each executor parses its own byte
range, so a single 1 TB .jsonl file still parallelizes (unlike gzip'd
variants, which are whole-file streams; at scale you store zstd-seekable
or many shards).

Design notes:
- Explicit schema when known (one pass, no inference job); otherwise
  ``samplingRatio`` bounds the inference pass instead of reading 100 TB
  twice.
- ``columnNameOfCorruptRecord`` captures malformed lines as data instead
  of failing the job — the permissive-with-quarantine pattern every
  large-scale ingest needs (count them, don't die on line 3 billion).
- ``events_from_jsonl`` lands the fixture ``events`` shape with try_cast
  semantics (ANSI mode makes plain casts THROW; ingest must coerce to
  NULL — same rule as the CSV path, sources/csv_sales.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

EVENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("props", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sampling_ratio: float = 0.1,
) -> DataFrame:
    """Distributed JSONL scan. With a schema: single pass, malformed lines
    quarantined into ``_corrupt_record``. Without: sampled inference, then
    the full read runs against the inferred schema EXTENDED with the
    corrupt-record column — ``columnNameOfCorruptRecord`` only takes
    effect when the active schema contains that field, and a clean
    inference sample would otherwise silently DROP malformed lines in
    unsampled regions instead of quarantining them (ADVICE r4), breaking
    the count-don't-die contract."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is None:
        inferred = (
            spark.read.option("samplingRatio", str(sampling_ratio))
            .json(path)
            .schema
        )
        schema = T.StructType(
            [f for f in inferred.fields if f.name != CORRUPT_COL]
            + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return reader.schema(schema).json(path)


def events_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → the fixture ``events`` schema. All-string read + try_cast:
    a bad value nulls the cell (never fails the scan), and the cast
    expressions fold into the scan projection."""
    raw = read_jsonl(spark, path, schema=EVENTS_JSONL_SCHEMA)
    return raw.select(
        F.col("event_id").try_cast("bigint").alias("event_id"),
        F.col("ts").try_cast("timestamp_ntz").alias("ts"),
        F.col("user_id").try_cast("bigint").alias("user_id"),
        F.col("event_type"),
        F.col("value").try_cast("double").alias("value"),
        F.col("props"),
        F.col(CORRUPT_COL).isNotNull().alias("is_corrupt"),
    )


def corrupt_line_stats(df: DataFrame) -> DataFrame:
    """Quarantine accounting: rows parsed vs malformed (the number a 100 TB
    ingest alerts on). ``n_typed`` (rows with a parseable event_type) also
    keeps a data column in the aggregate — Spark disallows queries whose
    only referenced column is the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("is_corrupt").cast("long")).alias("n_corrupt"),
        F.count("event_type").alias("n_typed"),
    )
