"""Model addressing + the reference planner's equivalence invariant
("the optimized route is byte-identical to the naive route" —
query-engine.md:86): the pushdown-friendly filter translation must
select exactly the same rows as the null-safe boolean projection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hydraide_spark.model import Name, island_id_col
from hydraide_spark.query import And, Cmp, Not, Op, Or, translate, translate_bool
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_island_addressing_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [("users", "profiles", f"user-{i}") for i in range(500)],
        ["sanctuary", "realm", "swamp"],
    )
    ids = df.select(island_id_col().alias("i"))
    rows = [r["i"] for r in ids.collect()]
    assert all(1 <= i <= 1000 for i in rows)  # 1-based slot space
    # deterministic: same input -> same slots on recompute
    assert rows == [r["i"] for r in ids.collect()]
    # and reasonably spread (hash, not constant)
    assert len(set(rows)) > 200


def test_name_path():
    n = Name("users", "profiles", "u1")
    assert n.path() == "users/profiles/u1"


PREDICATES = [
    Cmp("p_size", Op.GE, 25),
    And([Cmp("p_brand", Op.EQ, "Brand#3"), Cmp("p_retailprice", Op.LT, 1200.0)]),
    Or([Cmp("p_type", Op.IN, ["PROMO", "SMALL"]), Cmp("p_name", Op.CONTAINS, "red")]),
    Not(Cmp("p_name", Op.ENDS_WITH, "bolt")),
    Or(
        [
            And([Cmp("p_size", Op.LT, 10), Cmp("p_brand", Op.NE, "Brand#1")]),
            Cmp("p_name", Op.STARTS_WITH, "small"),
        ]
    ),
]


@pytest.mark.parametrize("pred", PREDICATES, ids=range(len(PREDICATES)))
def test_filter_translation_equivalence(spark, pred):
    """translate() (raw, pushable) and translate_bool() (coalesced,
    projective) must select the same rows — the engine's version of the
    bucket-route == bypass-route invariant."""
    part = load_table(spark, SF, "part")
    fast = part.filter(translate(pred, part)).select("p_partkey")
    naive = part.filter(translate_bool(pred, part)).select("p_partkey")
    a = sorted(r["p_partkey"] for r in fast.collect())
    b = sorted(r["p_partkey"] for r in naive.collect())
    assert a == b


def test_numeric_tower_coercion(spark):
    """int/float comparison coercion (reference toInt64/toFloat64,
    filter.go:392-493): an int column compares against float literals
    and vice versa without loss."""
    df = spark.createDataFrame([(1, 10, 10.5), (2, 11, 11.0)], ["id", "i", "f"])
    assert [r["id"] for r in df.filter(translate(Cmp("i", Op.GT, 10.5), df)).collect()] == [2]
    assert [r["id"] for r in df.filter(translate(Cmp("f", Op.EQ, 11), df)).collect()] == [2]
    assert [r["id"] for r in df.filter(translate(Cmp("i", Op.LE, 10.0), df)).collect()] == [1]
