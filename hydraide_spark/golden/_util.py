"""Shared helpers for golden queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: per-process memo of INPUT CONSTANTS that are pure functions of the
#: immutable sf_dir fixtures (row counts feeding synthetic-graph
#: moduli, the point-lookup query vector) — the vectors._model_memo
#: convention. These cache one bounded scalar job per (sf_dir, args),
#: never any query RESULT: every invocation still computes its output
#: from the parquet inputs.
_STAT_MEMO: dict = {}


def n_rows_memo(spark: SparkSession, sf_dir: str, name: str) -> int:
    key = ("n_rows", sf_dir, name)
    if key not in _STAT_MEMO:
        _STAT_MEMO[key] = t(spark, sf_dir, name).count()
    return _STAT_MEMO[key]


def parallelize_small(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Spread a small-file input across the cluster before compute-heavy
    per-row work (hashing, UDF batches). Local parquet fixtures arrive
    in 1-3 partitions (one row group per file), which would pin the
    expensive pipelines to as many cores; at production scale the file
    count provides this parallelism and the repartition collapses to a
    no-op cost relative to the downstream work.

    ``cap`` bounds the fan-out for Arrow/pandas stages: each partition
    is a Python worker whose startup+import cost dwarfs trivial per-row
    work, so batch-heavy UDF stages want fewer, larger Arrow batches."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if cap is not None:
        target = min(target, cap)
    return df.repartition(target)


def big(c: Column | str) -> Column:
    """Cast to BIGINT — canonical integer width for oracle comparison."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("bigint")


def dec(c: Column | str, scale: int = 2, precision: int = 28) -> Column:
    """Canonical decimal for exact, order-independent aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def dbl(c: Column) -> Column:
    return c.cast("double")


def orders_as_swamp(df: DataFrame) -> DataFrame:
    """View the TPC-H orders table as a treasure swamp: string key +
    value columns + nullable created_at (every 10th row unstamped, to
    exercise the §1.4 null-timestamp-exclusion rule)."""
    return df.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_orderkey") % 10 != 0, F.col("o_orderdate")).alias("created_at"),
    )


ORDERS_SWAMP_SQL = """
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           o_totalprice AS totalprice,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           CASE WHEN o_orderkey % 10 <> 0 THEN o_orderdate END AS created_at
    FROM orders
"""
