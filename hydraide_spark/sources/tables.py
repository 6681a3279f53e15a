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


def _ns_epoch(dt) -> int:
    """Exact nanoseconds since epoch for a naive-UTC datetime — integer
    arithmetic only (float epoch*1e9 exceeds 2^53 and rounds)."""
    import calendar

    return calendar.timegm(dt.timetuple()) * 10**9 + dt.microsecond * 1000


def load_table_time_bounded(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    bounds: dict,
) -> DataFrame:
    """`load_table` with time-range bounds applied BEFORE the ns→µs
    conversion, as integer comparisons on the raw long column. A bound
    on the converted column sits above a projection and cannot reach the
    scan (only IsNotNull pushes); the raw-column form lands in
    PushedFilters, so parquet row-group min/max stats prune the read —
    the difference between scanning a day and scanning 100 TB.
    ``bounds``: {column: (lo_inclusive | None, hi_exclusive | None)}
    with naive-UTC datetimes."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, name)
    df = spark.read.parquet(path)
    nanos_cols = set(_nanos_timestamp_columns(path))
    for col, (lo, hi) in bounds.items():
        if col in nanos_cols:
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(_ns_epoch(lo)))
            if hi is not None:
                df = df.filter(F.col(col) < F.lit(_ns_epoch(hi)))
        else:
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) < F.lit(hi))
    for col in nanos_cols:
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
