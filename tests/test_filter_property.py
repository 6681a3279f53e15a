"""Property test: random filter trees evaluate identically through the
engine's Column translation and an independent Python interpreter of the
documented semantics (three-valued scalar ops, two-valued negative
slice/IN forms, Kleene AND/OR/NOT, NULL row drops under a filter).

Mirrors the reference's fixed-seed property style
(msgpackpatch/property_test.go): derandomized hypothesis, bounded tree
depth, every generated tree checked row-for-row.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from hydraide_spark.query import And, Cmp, Not, Op, Or, translate

ROWS = [
    Row(rid=0, i=None, s=None, arr=None),
    Row(rid=1, i=0, s="", arr=[]),
    Row(rid=2, i=-2, s="a", arr=[1]),
    Row(rid=3, i=1, s="ab", arr=[1, 2]),
    Row(rid=4, i=2, s="abc", arr=[3]),
    Row(rid=5, i=3, s="b", arr=[2, 3]),
    Row(rid=6, i=-3, s="ba", arr=None),
    Row(rid=7, i=None, s="ab", arr=[1, 2, 3]),
    Row(rid=8, i=2, s=None, arr=[]),
]


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(
        ROWS, "rid int, i int, s string, arr array<int>"
    ).cache()
    df.count()
    return df


# --- independent evaluator (Kleene tri-state: True / False / None) ----------


def _k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _ev_cmp(row, c: Cmp):
    v = getattr(row, c.field)
    op, val = c.op, c.value
    if op in (Op.EQ, Op.NE, Op.GT, Op.GE, Op.LT, Op.LE):
        if v is None:
            return None
        return {
            Op.EQ: v == val, Op.NE: v != val, Op.GT: v > val,
            Op.GE: v >= val, Op.LT: v < val, Op.LE: v <= val,
        }[op]
    if op in (Op.CONTAINS, Op.NOT_CONTAINS, Op.STARTS_WITH, Op.ENDS_WITH):
        if v is None:
            return None
        return {
            Op.CONTAINS: val in v,
            Op.NOT_CONTAINS: val not in v,
            Op.STARTS_WITH: v.startswith(val),
            Op.ENDS_WITH: v.endswith(val),
        }[op]
    if op is Op.IN:
        return None if v is None else v in val
    if op is Op.NOT_IN:  # two-valued: False on NULL
        return v is not None and v not in val
    if op is Op.IS_EMPTY:
        if c.field == "s":
            return v is None or v == ""
        if c.field == "arr":
            return v is None or len(v) == 0
        return v is None
    if op is Op.IS_NOT_EMPTY:
        return not _ev_cmp(row, Cmp(c.field, Op.IS_EMPTY))
    if op is Op.SLICE_CONTAINS:  # two-valued: False on NULL
        return v is not None and val in v
    if op is Op.SLICE_NOT_CONTAINS:
        return v is not None and val not in v
    raise AssertionError(op)


def _ev(row, pred):
    if isinstance(pred, And):
        out = True
        for p in pred.items:
            out = _k_and(out, _ev(row, p))
        return out
    if isinstance(pred, Or):
        if not pred.items:
            return True  # empty group => pass-all, same as And
        out = False
        for p in pred.items:
            out = _k_or(out, _ev(row, p))
        return out
    if isinstance(pred, Not):
        inner = _ev(row, pred.item)
        return None if inner is None else not inner
    return _ev_cmp(row, pred)


# --- tree generator ---------------------------------------------------------

_INT_OPS = [Op.EQ, Op.NE, Op.GT, Op.GE, Op.LT, Op.LE]
_STR_OPS = [Op.EQ, Op.NE, Op.CONTAINS, Op.NOT_CONTAINS, Op.STARTS_WITH, Op.ENDS_WITH]

_leaf = st.one_of(
    st.builds(Cmp, st.just("i"), st.sampled_from(_INT_OPS), st.integers(-3, 3)),
    st.builds(
        Cmp, st.just("s"), st.sampled_from(_STR_OPS), st.sampled_from(["a", "ab", "b", ""])
    ),
    st.builds(Cmp, st.sampled_from(["s", "arr", "i"]), st.sampled_from([Op.IS_EMPTY, Op.IS_NOT_EMPTY])),
    st.builds(
        Cmp, st.just("i"), st.sampled_from([Op.IN, Op.NOT_IN]),
        st.lists(st.integers(-3, 3), min_size=1, max_size=3),
    ),
    st.builds(
        Cmp, st.just("arr"), st.sampled_from([Op.SLICE_CONTAINS, Op.SLICE_NOT_CONTAINS]),
        st.integers(0, 3),
    ),
)

_tree = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.builds(And, st.lists(children, max_size=3).map(tuple)),
        st.builds(Or, st.lists(children, max_size=3).map(tuple)),
        st.builds(Not, children),
    ),
    max_leaves=8,
)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(pred=_tree)
def test_random_tree_matches_reference_semantics(frame, pred):
    got = sorted(r["rid"] for r in frame.filter(translate(pred, frame)).collect())
    want = sorted(r.rid for r in ROWS if _ev(r, pred) is True)
    assert got == want, f"tree {pred} diverged"
