"""XML source/sink — Spark 4's NATIVE ``xml`` format (the spark-xml
package merged into core), the remaining interchange format enterprise
document drops arrive in (feeds, sitemaps, legacy CMS exports).

The reference ingests CSV and documents only (SURVEY §2.1); XML joins
JSONL as a charter forward-looking source with the same design rules:

- Explicit schema when known (one pass, no inference job); otherwise
  ``samplingRatio`` bounds the inference pass.
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` quarantines malformed
  records as data instead of failing the job — identical
  count-don't-die contract to sources/jsonl.py, including the
  schema-extension subtlety (the corrupt column only captures when the
  ACTIVE schema contains it).
- ``rowTag`` selects the repeated element; each row element parses
  independently, so the scan distributes across files/shards. (A single
  giant XML file is NOT line-splittable the way JSONL is — at 100 TB you
  shard the export; the reader then parallelizes per file.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCS_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def write_xml(df: DataFrame, path: str, row_tag: str = "doc") -> None:
    """Native XML sink (one <row_tag> element per row, sharded per
    partition — the layout the distributed reader parallelizes over)."""
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "doc",
    schema: T.StructType | None = None,
    sampling_ratio: float = 0.1,
) -> DataFrame:
    """Distributed XML scan with the permissive-quarantine contract
    (module docstring)."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is None:
        inferred = (
            spark.read.format("xml")
            .option("rowTag", row_tag)
            .option("samplingRatio", str(sampling_ratio))
            .load(path)
            .schema
        )
        schema = T.StructType(
            [f for f in inferred.fields if f.name != CORRUPT_COL]
            + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return reader.schema(schema).load(path)


def docs_from_xml(spark: SparkSession, path: str) -> DataFrame:
    """XML → the fixture ``documents`` shape: all-string read + try_cast
    (ANSI-safe coerce-to-NULL, folded into the scan projection) plus the
    quarantine flag."""
    raw = read_xml(spark, path, schema=DOCS_XML_SCHEMA)
    return raw.select(
        F.col("doc_id").try_cast("bigint").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.col(CORRUPT_COL).isNotNull().alias("is_corrupt"),
    )
