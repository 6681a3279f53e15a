"""Table profiling: per-column summary statistics in ONE pass — the
ANALYZE/describe surface an engine needs before layout and validation
decisions (null ratios pick validation rules, distinct counts pick
bucketing/broadcast strategies, min/max seed zone-map expectations).

Execution shape: every column's (non-null count, distinct count, min,
max) folds into a single wide aggregate over one scan — profiling 50
columns costs one pass, not 50. Exact distincts shuffle one count-
distinct per column inside the same aggregate; callers with 1000+
columns at 100 TB switch ``approx=True`` to HLL sketches
(approx_count_distinct, fixed-size state) and keep the single-pass
shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """One row per column: (column, dtype, n, n_null, n_distinct,
    min_str, max_str). min/max compare in the column's NATIVE type and
    render to strings only for the uniform report schema."""
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in df.columns:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(col) if approx else F.countDistinct(col)
        )
        aggs += [
            F.count(col).cast("bigint").alias(f"_nn_{c}"),
            distinct.cast("bigint").alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mn_{c}"),
            F.max(col).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("_n").alias("n"),
            (F.col("_n") - F.col(f"_nn_{c}")).cast("bigint").alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_str"),
            F.col(f"_mx_{c}").alias("max_str"),
        )
        for c in df.columns
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.column", "s.dtype", "s.n", "s.n_null", "s.n_distinct",
        "s.min_str", "s.max_str",
    )
