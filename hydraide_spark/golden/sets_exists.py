"""Golden queries: set-valued cells (Uint32Slice push/delete/size/
membership) and existence checks (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import read as R
from . import golden
from ._util import big, t


@golden(
    "uint32slice_ops",
    oracle="""
    WITH refs AS (
      SELECT l_suppkey AS key, list_distinct(list(l_orderkey)) AS ids
      FROM lineitem GROUP BY l_suppkey
    ),
    pushed AS (
      SELECT key, list_distinct(list_cat(ids, [1, 2, 3]::BIGINT[])) AS ids FROM refs
    ),
    deleted AS (
      SELECT key, list_filter(ids, x -> x NOT IN (5, 7)) AS ids FROM pushed
    )
    SELECT CAST(key AS BIGINT) AS key,
           CAST(len(ids) AS BIGINT) AS size_after,
           list_contains(ids, 10) AS has_10,
           CAST(list_aggregate(ids, 'min') AS BIGINT) AS min_id
    FROM deleted
    """,
)
def uint32slice_ops(spark, sf_dir):
    """Uint32Slice reverse-index ops (proto:378-418): build the
    word->set-of-ids shape (supplier -> order ids) from lineitem, then
    Push (union + auto-dedup), Delete (except), Size, IsValueExist — all
    as set-algebra array functions in one projection, no extra shuffle
    beyond the building groupBy."""
    li = t(spark, sf_dir, "lineitem")
    refs = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.array_distinct(F.collect_list("l_orderkey")).alias("ids")
    )
    pushed = refs.withColumn(
        "ids",
        F.array_distinct(
            F.concat(F.col("ids"), F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<bigint>"))
        ),
    )
    deleted = pushed.withColumn(
        "ids", F.array_except(F.col("ids"), F.array(F.lit(5), F.lit(7)).cast("array<bigint>"))
    )
    return deleted.select(
        big("key").alias("key"),
        F.size("ids").cast("bigint").alias("size_after"),
        F.array_contains("ids", F.lit(10).cast("bigint")).alias("has_10"),
        F.array_min("ids").cast("bigint").alias("min_id"),
    )


@golden(
    "reverse_index_semijoin",
    oracle="""
    WITH refs AS (
      SELECT l_suppkey, list_distinct(list(l_orderkey)) AS ids
      FROM lineitem GROUP BY l_suppkey
    ),
    resolved AS (SELECT unnest(ids) AS o_orderkey FROM refs WHERE l_suppkey IN (1, 2)),
    keys AS (SELECT DISTINCT o_orderkey FROM resolved)
    SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_totalprice
    FROM orders o JOIN keys k ON o.o_orderkey = k.o_orderkey
    """,
)
def reverse_index_semijoin(spark, sf_dir):
    """The hydrex pattern (reference sdk hydrex.go + GetByKeys): resolve
    a reverse index to an id set, then batch-read the ids — in Spark one
    explode + semi-join, the N+1 collapse of SURVEY.md §2.3."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    refs = li.groupBy("l_suppkey").agg(
        F.array_distinct(F.collect_list("l_orderkey")).alias("ids")
    )
    ids = (
        refs.filter(F.col("l_suppkey").isin(1, 2))
        .select(F.explode("ids").alias("o_orderkey"))
        .distinct()
    )
    return (
        orders.join(ids, "o_orderkey", "left_semi")
        .select(big("o_orderkey").alias("o_orderkey"), "o_totalprice")
    )


@golden(
    "keys_exist",
    oracle="""
    WITH probe(key) AS (VALUES ('1'), ('42'), ('77'), ('999999')),
    present AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) AS key FROM supplier)
    SELECT p.key, (pr.key IS NOT NULL) AS exists
    FROM probe p LEFT JOIN present pr ON p.key = pr.key
    """,
)
def keys_exist(spark, sf_dir):
    """AreKeysExist (proto:299-340): every probed key reported with a
    boolean — left join against the distinct key set."""
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("key")
    )
    return R.keys_exist(sup, ["1", "42", "77", "999999"])
