"""Increment get-or-create + metadata-stamping semantics, fuzzed
against a driver-side model (the same style as the patch-algebra
property suite): for random base states, key lists, deltas and
conditions, the relational implementation must agree row-for-row with
the obvious per-key interpretation of swamp.go:1274-1352 —
get-or-create at 0, condition on the current value, SetIfNotExist vs
SetIfExist metadata, NULL values never incrementable."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from hydraide_spark.operators.mutate import IncrementMeta, increment
from hydraide_spark.query import Cmp, Op

NOW = 1_700_000_000_000_000

_vals = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))


@st.composite
def scenarios(draw):
    base_keys = draw(
        st.lists(
            st.sampled_from([f"b{i}" for i in range(8)]),
            unique=True,
            min_size=1,
            max_size=8,
        )
    )
    base = {k: draw(_vals) for k in base_keys}
    req = draw(
        st.lists(
            st.sampled_from([f"b{i}" for i in range(8)] + ["m1", "m2", "m3"]),
            unique=True,
            min_size=1,
            max_size=6,
        )
    )
    delta = draw(st.integers(min_value=-10, max_value=10))
    threshold = draw(st.integers(min_value=-30, max_value=30))
    return base, req, delta, threshold


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenarios())
def test_increment_get_or_create_matches_model(spark, scenario):
    base, req, delta, threshold = scenario
    df = spark.createDataFrame(
        [Row(key=k, val=v) for k, v in base.items()], "key string, val long"
    )
    out = {
        r["key"]: r
        for r in increment(
            df,
            "val",
            delta,
            condition=Cmp("val", Op.LT, threshold),
            keys=req,
            meta_if_not_exist=IncrementMeta(created_at=True, created_by="c"),
            meta_if_exist=IncrementMeta(updated_at=True, updated_by="u"),
            now_us=NOW,
        ).collect()
    }
    assert set(out) == set(req)
    for k in req:
        r = out[k]
        created = k not in base
        old = 0 if created else base[k]
        applied = old is not None and old < threshold
        assert r["created"] == created, (k, scenario)
        assert r["old_value"] == old, (k, scenario)
        assert r["applied"] == applied, (k, scenario)
        assert r["new_value"] == (old + delta if applied else old), (k, scenario)
        # metadata: created keys take SetIfNotExist, existing SetIfExist —
        # stamped regardless of the condition outcome (reference stamps
        # inside the guard BEFORE the condition check)
        if created:
            assert (r["created_at_us"], r["created_by"]) == (NOW, "c")
            assert r["updated_at_us"] is None and r["updated_by"] is None
        else:
            assert (r["updated_at_us"], r["updated_by"]) == (NOW, "u")
            assert r["created_at_us"] is None and r["created_by"] is None
        assert r["expired_at_us"] is None
