"""Parquet table sources for the engine's test corpus.

The driver's synthetic tables (TESTDATA.md) are plain parquet — the
engine's canonical storage format (columnar, compressed, min/max-pruned;
replaces the reference's per-swamp append-only ``.hyd`` files, see
SURVEY.md §2.1 "File format / connector").

At 100 TB each logical table is a partitioned parquet/Delta dataset;
``load_table`` takes a directory or file path, so the same call serves
``.../lineitem.parquet`` locally and ``.../lineitem/`` (partitioned)
on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Parquet TIMESTAMP(NANOS) columns — Spark has no nanosecond type,
    so the session reads them as long (nanosAsLong) and we convert to
    microsecond timestamps (integer div, no double round-trip: ns values
    exceed 2^53)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return []
            path = os.path.join(path, inner[0])
        schema = pq.read_schema(path)
        return [
            name
            for name, typ in zip(schema.names, schema.types)
            if pa.types.is_timestamp(typ) and typ.unit == "ns"
        ]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, name)
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_columns(path):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
