"""Interchange formats beyond parquet: JSONL and CSV readers/writers
with EXPLICIT schemas.

LLM corpora ship as JSONL (one document object per line: Common
Crawl-derived sets, RedPajama, Dolma all publish this shape); tabular
sidecar data often arrives as CSV. Parquet stays the engine's canonical
storage (SURVEY.md §2.1), these are ingest/egress edges.

Scale rules baked in:
- NEVER schema-infer: inference is a full extra pass over 100 TB before
  the real job starts, and a sampled inference can silently widen or
  narrow types between runs. Callers pass a StructType (or reuse a
  parquet table's schema).
- ``mode=FAILFAST`` by default: a malformed line at row 10^12 should
  fail loudly, not become a row of NULLs (PERMISSIVE is opt-in, with
  ``columnNameOfCorruptRecord`` wired so bad lines are quarantinable).
- JSONL is splittable as written (one object per line, no multiline),
  so a 1 GB file still fans out across executors by byte range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: StructType) -> StructType:
    # StructType.add mutates in place — build a fresh one
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    permissive: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema (no inference
    pass). ``permissive=True`` keeps malformed lines in
    ``_corrupt_record`` instead of failing the job."""
    reader = spark.read.schema(
        _with_corrupt_col(schema) if permissive else schema
    ).option("multiLine", "false")
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write line-delimited JSON; one shard per partition, so upstream
    ``repartition(n)`` controls shard count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    permissive: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema (no inference pass)."""
    reader = (
        spark.read.schema(_with_corrupt_col(schema) if permissive else schema)
        .option("header", str(header).lower())
        .option("multiLine", "false")
    )
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    w.csv(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet generations whose schema GREW over time (new
    nullable columns in later ingests) as one frame: ``mergeSchema``
    unions the file schemas and back-fills missing columns with NULL.

    Scale note: mergeSchema reads every file's FOOTER to build the
    union — O(#files) metadata work, not a data pass — so it belongs
    on generation boundaries (a handful of directory roots), not on
    every query; once merged, write the canonical schema back so daily
    readers pay nothing. Column REMOVALS or type changes are not
    evolution — they need an explicit migration select."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
