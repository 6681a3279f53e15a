"""Mergeable HLL sketch semantics (functions/sketches.py): exactness in
the sparse regime, partition invariance, rollup-without-rescan, and the
error bound in the dense regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.sketches import (
    exact_distinct,
    hll_group_sketches,
    hll_rollup,
)
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sparse_regime_is_exact_and_rollup_matches(spark):
    ev = load_table(spark, SF, "events")
    sk = hll_group_sketches(ev, ["event_type"], "user_id", lg_k=14)
    est = {r["event_type"]: r["distinct_est"] for r in sk.collect()}
    exact = {
        r["event_type"]: r["distinct_exact"]
        for r in exact_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert est == exact
    # global rollup from the stored sketches — no raw-data rescan —
    # equals the exact global distinct
    merged = hll_rollup(sk, []).collect()[0]["distinct_est"]
    assert merged == exact_distinct(ev, [], "user_id").collect()[0]["distinct_exact"]


def test_sketch_estimates_are_partition_invariant(spark):
    ev = load_table(spark, SF, "events")
    one = hll_group_sketches(ev.repartition(1), ["event_type"], "user_id")
    many = hll_group_sketches(ev.repartition(16), ["event_type"], "user_id")
    a = {r["event_type"]: r["distinct_est"] for r in one.collect()}
    b = {r["event_type"]: r["distinct_est"] for r in many.collect()}
    assert a == b


def test_dense_regime_error_bound(spark):
    # 200k distinct ids >> coupon capacity at lg_k=12: estimate, not
    # exact — relative error must stay within the HLL bound (~3 sigma)
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("v"), (F.col("id") % 4).alias("g"))
    sk = hll_group_sketches(df, [], "v", lg_k=12)
    est = sk.collect()[0]["distinct_est"]
    assert abs(est - n) / n < 0.03


def test_rollup_to_intermediate_grouping(spark):
    # sketches built at (event_type, user bucket) granularity roll up
    # to per-event_type without rescanning; sparse regime => exact
    ev = load_table(spark, SF, "events").withColumn("b", F.col("event_id") % 3)
    fine = hll_group_sketches(ev, ["event_type", "b"], "user_id", lg_k=14)
    rolled = hll_rollup(fine, ["event_type"])
    exact = exact_distinct(ev, ["event_type"], "user_id")
    r = {x["event_type"]: x["distinct_est"] for x in rolled.collect()}
    e = {x["event_type"]: x["distinct_exact"] for x in exact.collect()}
    assert r == e
