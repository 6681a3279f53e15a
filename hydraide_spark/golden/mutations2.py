"""Golden queries: delete/shift-by-keys, the full structural patch
op-set, and uint64 fidelity via DECIMAL(20,0) (SURVEY.md §1.2's
numeric-tower edge: the reference guards uint64 > int64-max explicitly;
Spark carries the full range in decimal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import mutate as M
from . import golden
from ._util import big, t


@golden(
    "shift_by_keys_claim",
    oracle="""
    SELECT CAST(s_suppkey AS VARCHAR) AS key, s_name
    FROM supplier WHERE s_suppkey IN (1, 3, 5, 7)
    """,
)
def shift_by_keys_claim(spark, sf_dir):
    """ShiftByKeys (proto:127-157): atomic read+delete by key list —
    the claimed rows are the output; missing keys silently absent. The
    state side (remaining = anti-join) is asserted in store tests."""
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("key"), "s_name"
    )
    claimed, _remaining = M.shift_by_keys(sup, ["1", "3", "5", "7", "999999"])
    return claimed


@golden(
    "delete_remaining_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_remaining
    FROM supplier WHERE s_suppkey NOT IN (1, 2, 3)
    """,
)
def delete_remaining_count(spark, sf_dir):
    """Delete (gateway.go:1326-1395) as the anti-join rewrite: state
    after deleting 3 keys."""
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("key"), "s_name"
    )
    remaining, _deleted = M.delete_treasures(sup, ["1", "2", "3"])
    return remaining.agg(F.count(F.lit(1)).alias("n_remaining"))


@golden(
    "patch_full_opset",
    oracle="""
    WITH e AS (
      SELECT event_id,
             ['a', event_type, 'z'] AS tags0,
             user_id % 4 AS n
      FROM events
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(n + 10 AS BIGINT) AS n_after,
           array_to_string(
             list_prepend('first', list_filter(tags0, x -> x <> 'z'))[1:2] || ['appended'],
             '|') AS tags_after,
           'merged' AS merged_flag
    FROM e
    """,
)
def patch_full_opset(spark, sf_dir):
    """The full patch op-set in one ordered list (proto:2988-3177):
    INC, REMOVE_VAL, PREPEND, REMOVE_AT (out-of-range tail), APPEND,
    MERGE — applied in order, unconditional (structural mode). The
    oracle recomputes the list algebra independently."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.struct(
            F.array(F.lit("a"), F.col("event_type"), F.lit("z")).alias("tags"),
            (F.col("user_id") % 4).alias("n"),
            F.struct(F.lit("x").alias("inner")).alias("meta"),
        ).alias("body"),
    )
    ops = [
        M.PatchOp(M.PatchKind.INC, "n", 10),
        M.PatchOp(M.PatchKind.REMOVE_VAL, "tags", "z"),
        M.PatchOp(M.PatchKind.PREPEND, "tags", "first"),
        M.PatchOp(M.PatchKind.REMOVE_AT, "tags", 2),  # drop 3rd element
        M.PatchOp(M.PatchKind.APPEND, "tags", "appended"),
        M.PatchOp(M.PatchKind.MERGE, "meta", {"flag": "merged"}),
    ]
    out = M.patch_treasures(ev, ops, key_col="event_id")
    return out.select(
        big("event_id").alias("event_id"),
        F.col("body.n").cast("bigint").alias("n_after"),
        F.concat_ws("|", F.col("body.tags")).alias("tags_after"),
        F.col("body.meta.flag").alias("merged_flag"),
    )


@golden(
    "uint64_decimal_fidelity",
    oracle="""
    WITH c AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS key,
             CAST('9223372036854775808' AS DECIMAL(20,0))
               + CAST(o_orderkey AS DECIMAL(20,0)) AS v
      FROM orders WHERE o_orderkey <= 1000
    )
    SELECT key, CAST(v AS VARCHAR) AS v_str
    FROM c
    WHERE v > CAST('9223372036854776307' AS DECIMAL(20,0))
    """,
)
def uint64_decimal_fidelity(spark, sf_dir):
    """uint64 full-range fidelity (SURVEY §1.2): values above int64-max
    live in DECIMAL(20,0); comparisons and arithmetic stay exact where
    the reference needs an explicit uint64 guard (filter.go:410-415).
    Output as canonical strings so the hash ignores decimal binary
    representation differences."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    c = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        (
            F.lit("9223372036854775808").cast("decimal(20,0)")
            + F.col("o_orderkey").cast("decimal(20,0)")
        ).alias("v"),
    )
    return c.filter(
        F.col("v") > F.lit("9223372036854776307").cast("decimal(20,0)")
    ).select("key", F.col("v").cast("string").alias("v_str"))


@golden(
    "patch_many",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CASE WHEN event_id % 2 = 0 THEN 'even' ELSE 'odd' END AS swamp,
           CAST(CASE WHEN event_id % 2 = 0 THEN (user_id % 4) + 5
                     WHEN user_id % 4 < 2 THEN (user_id % 4) + 7
                     ELSE user_id % 4 END AS BIGINT) AS n_after,
           CASE WHEN event_id % 2 = 0 OR user_id % 4 < 2 THEN 'PATCHED'
                ELSE 'CONDITION_NOT_MET' END AS patch_status
    FROM events
    """,
)
def patch_many(spark, sf_dir):
    """PatchTreasuresMany (proto:475-492): independent per-swamp patch
    entries — each swamp gets its OWN op-list and condition, results fan
    in tagged with the source swamp and per-row statuses. Here: 'even'
    swamp INCs unconditionally by 5, 'odd' INCs by 7 only where n < 2
    (condition failures re-inserted unchanged, CONDITION_NOT_MET)."""
    from ..query import Cmp, Op

    ev = t(spark, sf_dir, "events").select(
        "event_id", F.struct((F.col("user_id") % 4).alias("n")).alias("body")
    )
    entries = [
        ("even", ev.filter(F.col("event_id") % 2 == 0),
         [M.PatchOp(M.PatchKind.INC, "n", 5)], None),
        ("odd", ev.filter(F.col("event_id") % 2 == 1),
         [M.PatchOp(M.PatchKind.INC, "n", 7)], Cmp("body.n", Op.LT, 2)),
    ]
    parts = [
        M.patch_treasures(df, ops, condition=cond, key_col="event_id")
        .withColumn("swamp", F.lit(name))
        for name, df, ops, cond in entries
    ]
    out = parts[0].unionByName(parts[1])
    return out.select(
        big("event_id").alias("event_id"),
        "swamp",
        F.col("body.n").cast("bigint").alias("n_after"),
        "patch_status",
    )


@golden(
    "profile_pivot",
    oracle="""
    WITH long AS (
      SELECT c_custkey AS k, 'name' AS field, c_name AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'segment', c_mktsegment FROM customer
      UNION ALL
      SELECT c_custkey, 'balance', CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
      FROM customer
    )
    SELECT CAST(k AS BIGINT) AS key,
           MAX(CASE WHEN field = 'name' THEN value END) AS name,
           MAX(CASE WHEN field = 'segment' THEN value END) AS segment,
           MAX(CASE WHEN field = 'balance' THEN value END) AS balance
    FROM long WHERE k <= 200 GROUP BY k
    """,
)
def profile_pivot(spark, sf_dir):
    """Profile composition from the reference's ACTUAL storage shape
    (proto:2908-2954): one Treasure per field, keyed by field name —
    i.e., a long (entity, field, value) table — pivoted to the wide
    entity row (SURVEY §2.3 'if stored long: groupBy(entity).pivot').
    Explicit pivot values keep the plan to one shuffle, no discovery
    pass."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    long = cust.selectExpr(
        "c_custkey AS k",
        "stack(3, 'name', c_name, 'segment', c_mktsegment, "
        "'balance', CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS STRING)) AS (field, value)",
    )
    wide = (
        long.groupBy("k")
        .pivot("field", ["name", "segment", "balance"])
        .agg(F.first("value"))
    )
    return wide.select(
        big("k").alias("key"), "name", "segment", "balance"
    )
