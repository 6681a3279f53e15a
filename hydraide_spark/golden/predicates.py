"""Golden queries: the predicate engine (SURVEY.md §2.2).

Scalar compares, string ops, IN ops, IS_EMPTY, HAS_KEY, slice ops,
nested dotted paths, ``[*]`` wildcard, ``#len``, and NestedSliceWhere
quantifiers — each as a FilterGroup tree folded into one Column. The
inputs are derived in-query from the driver's tables (split text into
token arrays, JSON props into maps, grouped lineitems into
array-of-struct), so the DuckDB oracle can recompute them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..query import And, Cmp, NestedWhere, Op, Or, Quant, translate
from . import golden
from ._util import big, t


@golden(
    "filter_scalar_tree",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey
    FROM part
    WHERE (p_size >= 10 AND p_size < 40 AND p_type <> 'PROMO')
       OR (p_brand = 'Brand#1' AND p_retailprice <= 900.0)
    """,
)
def filter_scalar_tree(spark, sf_dir):
    """Recursive AND/OR FilterGroup of scalar compares (filter.go:221-312):
    the whole tree folds into one pushed-down scan predicate."""
    part = t(spark, sf_dir, "part")
    filt = Or(
        [
            And(
                [
                    Cmp("p_size", Op.GE, 10),
                    Cmp("p_size", Op.LT, 40),
                    Cmp("p_type", Op.NE, "PROMO"),
                ]
            ),
            And([Cmp("p_brand", Op.EQ, "Brand#1"), Cmp("p_retailprice", Op.LE, 900.0)]),
        ]
    )
    return part.filter(translate(filt, part)).select(big("p_partkey").alias("p_partkey"))


@golden(
    "filter_string_ops",
    oracle="""
    SELECT p_name
    FROM part
    WHERE (contains(p_name, 'red') AND NOT suffix(p_name, 'bolt'))
       OR (prefix(p_name, 'small') AND NOT contains(p_name, 'gear'))
    """,
)
def filter_string_ops(spark, sf_dir):
    """CONTAINS / NOT_CONTAINS / STARTS_WITH / ENDS_WITH, case-sensitive
    (compareString filter.go:518-531)."""
    from ..query import Not

    part = t(spark, sf_dir, "part")
    filt = Or(
        [
            And([Cmp("p_name", Op.CONTAINS, "red"), Not(Cmp("p_name", Op.ENDS_WITH, "bolt"))]),
            And([Cmp("p_name", Op.STARTS_WITH, "small"), Cmp("p_name", Op.NOT_CONTAINS, "gear")]),
        ]
    )
    return part.filter(translate(filt, part)).select("p_name")


@golden(
    "filter_in_ops",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
           CAST(p_size AS BIGINT) AS p_size
    FROM part
    WHERE p_brand IN ('Brand#1','Brand#7','Brand#17')
      AND p_size IN (5, 11, 28, 42)
      AND p_type NOT IN ('PROMO')
    """,
)
def filter_in_ops(spark, sf_dir):
    """STRING_IN / INT_IN set membership (filter_native.go:429-478)."""
    part = t(spark, sf_dir, "part")
    filt = And(
        [
            Cmp("p_brand", Op.IN, ["Brand#1", "Brand#7", "Brand#17"]),
            Cmp("p_size", Op.IN, [5, 11, 28, 42]),
            Cmp("p_type", Op.NOT_IN, ["PROMO"]),
        ]
    )
    return part.filter(translate(filt, part)).select(
        big("p_partkey").alias("p_partkey"), "p_brand", big("p_size").alias("p_size")
    )


_BIO_SQL = """
      SELECT event_id, event_type,
             CASE WHEN user_id % 7 = 0 THEN NULL
                  WHEN user_id % 7 = 1 THEN ''
                  ELSE event_type END AS bio
      FROM events
"""


@golden(
    "filter_is_empty",
    oracle=f"""
    WITH e AS ({_BIO_SQL})
    SELECT CAST(event_id AS BIGINT) AS event_id
    FROM e WHERE bio IS NULL OR bio = ''
    """,
)
def filter_is_empty(spark, sf_dir):
    """IS_EMPTY: unset OR empty string (filter_native.go:236-278; nil
    handling mirrored from filter_test.go:175-218)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "bio",
        F.when(F.col("user_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("user_id") % 7 == 1, F.lit(""))
        .otherwise(F.col("event_type")),
    )
    return ev.filter(translate(Cmp("bio", Op.IS_EMPTY), ev)).select(
        big("event_id").alias("event_id")
    )


@golden(
    "filter_has_key",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id
    FROM events
    WHERE CAST(regexp_extract(props, '[0-9]+') AS BIGINT) > 50
    """,
)
def filter_has_key(spark, sf_dir):
    """HAS_KEY on a map-typed body (proto:2038-2039): props JSON decodes
    to MAP<STRING,BIGINT>; keep only entries with value > 50, then probe
    map membership — data-dependent key presence."""
    ev = t(spark, sf_dir, "events").withColumn(
        "body",
        F.map_filter(
            F.from_json(F.col("props"), "map<string,bigint>"), lambda k, v: v > 50
        ),
    )
    return ev.filter(translate(Cmp("body", Op.HAS_KEY, "k"), ev)).select(
        big("event_id").alias("event_id")
    )


@golden(
    "filter_nested_path",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id
    FROM events
    WHERE event_type = 'purchase' AND value > 75.0 AND user_id % 3 = 0
    """,
)
def filter_nested_path(spark, sf_dir):
    """Dotted-path extraction A.B.C into a struct body (filter.go:331-390):
    build a two-level struct body, filter through deep paths."""
    ev = t(spark, sf_dir, "events").withColumn(
        "body",
        F.struct(
            F.struct(
                F.col("user_id").alias("id"),
                (F.col("user_id") % 3).alias("segment"),
            ).alias("user"),
            F.struct(F.col("event_type").alias("kind"), F.col("value").alias("amount")).alias(
                "action"
            ),
        ),
    )
    filt = And(
        [
            Cmp("body.action.kind", Op.EQ, "purchase"),
            Cmp("body.action.amount", Op.GT, 75.0),
            Cmp("body.user.segment", Op.EQ, 0),
        ]
    )
    return ev.filter(translate(filt, ev)).select(big("event_id").alias("event_id"))


@golden(
    "filter_slice_ops",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM documents
    WHERE list_contains(string_split(text, ' ')[1:8], 'data')
      AND NOT list_contains(string_split(text, ' ')[1:8], 'slow')
    """,
)
def filter_slice_ops(spark, sf_dir):
    """SLICE_CONTAINS / SLICE_NOT_CONTAINS (filter.go:650-714) over a
    token-array body field."""
    docs = t(spark, sf_dir, "documents").withColumn(
        "tags", F.slice(F.split(F.col("text"), " "), 1, 8)
    )
    filt = And(
        [Cmp("tags", Op.SLICE_CONTAINS, "data"), Cmp("tags", Op.SLICE_NOT_CONTAINS, "slow")]
    )
    return docs.filter(translate(filt, docs)).select(big("doc_id").alias("doc_id"))


@golden(
    "filter_slice_substring",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM documents
    WHERE len(list_filter(string_split(text, ' ')[1:8],
                          x -> contains(lower(x), lower('ATA')))) > 0
    """,
)
def filter_slice_substring(spark, sf_dir):
    """SLICE_CONTAINS_SUBSTRING — case-INsensitive by contract
    (filter.go:656-671): needle 'ATA' matches token 'data'."""
    docs = t(spark, sf_dir, "documents").withColumn(
        "tags", F.slice(F.split(F.col("text"), " "), 1, 8)
    )
    return docs.filter(
        translate(Cmp("tags", Op.SLICE_CONTAINS_SUBSTRING, "ATA"), docs)
    ).select(big("doc_id").alias("doc_id"))


@golden(
    "filter_len_and_wildcard",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM documents
    WHERE len(string_split(text, ' ')) > 40
      AND len(list_filter(string_split(text, ' '), x -> contains(x, 'park'))) > 0
    """,
)
def filter_len_and_wildcard(spark, sf_dir):
    """`#len` pseudo-path (filter.go:339-349) + `field[*]` wildcard
    any-element semantics (filter.go:352-377): token count > 40 AND any
    token CONTAINS 'park'."""
    docs = t(spark, sf_dir, "documents").withColumn("tokens", F.split(F.col("text"), " "))
    filt = And(
        [Cmp("tokens.#len", Op.GT, 40), Cmp("tokens[*]", Op.CONTAINS, "park")]
    )
    return docs.filter(translate(filt, docs)).select(big("doc_id").alias("doc_id"))


@golden(
    "nested_slice_quantifiers",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS o_orderkey,
           bool_or(l_quantity > 49.5) AS any_large,
           bool_and(l_quantity > 5.0) AS all_nontrivial,
           NOT bool_or(l_returnflag = 'A') AS none_a,
           (COUNT(*) FILTER (WHERE l_returnflag = 'R') >= 2) AS two_plus_r
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def nested_slice_quantifiers(spark, sf_dir):
    """NestedSliceWhere ANY/ALL/NONE/COUNT over array-of-struct
    (proto:2588-2631, filter_native.go:709-899): lineitems grouped into a
    per-order entries array, then all four quantifiers evaluated as
    higher-order functions in one projection."""
    li = t(spark, sf_dir, "lineitem")
    entries = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_quantity").alias("qty"), F.col("l_returnflag").alias("flag"))
        ).alias("entries")
    )
    q_any = NestedWhere("entries", Cmp("qty", Op.GT, 49.5), Quant.ANY)
    q_all = NestedWhere("entries", Cmp("qty", Op.GT, 5.0), Quant.ALL)
    q_none = NestedWhere("entries", Cmp("flag", Op.EQ, "A"), Quant.NONE)
    q_count = NestedWhere("entries", Cmp("flag", Op.EQ, "R"), Quant.COUNT, Op.GE, 2)
    return entries.select(
        big("l_orderkey").alias("o_orderkey"),
        translate(q_any, entries).alias("any_large"),
        translate(q_all, entries).alias("all_nontrivial"),
        translate(q_none, entries).alias("none_a"),
        translate(q_count, entries).alias("two_plus_r"),
    )
