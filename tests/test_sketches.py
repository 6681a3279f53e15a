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


def test_cms_overcounts_only_and_merge_equals_whole(spark):
    """The CMS contract: estimates never under-count (min over depth
    rows each of which includes every true occurrence), and building
    over partitions then merging equals building over the whole —
    the mergeability that makes it a 100 TB pre-aggregation."""
    import random

    from hydraide_spark.functions.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rng = random.Random(7)
    # 80 keys over width 256: P(a row is collision-free for a key)
    # ~ e^(-80/256) ~ 0.73, so P(all 4 rows collide) ~ 0.5% — nearly
    # every estimate should be exact (at load 2.0 it drops to ~45%)
    vals = [rng.randrange(80) for _ in range(4000)]
    truth: dict[int, int] = {}
    for v in vals:
        truth[v] = truth.get(v, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cms = cms_build(df, "v")
    probe_vals = sorted(truth)[:60] + [10_001, 10_002]  # incl. absent values
    probes = spark.createDataFrame([(v,) for v in probe_vals], "v long")
    est = {r["v"]: r["est"] for r in cms_estimate(cms, probes, "v").collect()}
    for v in probe_vals:
        assert est[v] >= truth.get(v, 0), (v, est[v], truth.get(v, 0))
    # with 500 keys over 4*256 cells the min-row is rarely collided;
    # most estimates should be exact
    exact = sum(1 for v in probe_vals if est[v] == truth.get(v, 0))
    assert exact >= len(probe_vals) * 0.8

    half_a = cms_build(df.filter(F.col("v") % 2 == 0), "v")
    half_b = cms_build(df.filter(F.col("v") % 2 == 1), "v")
    merged = {
        (r["d"], r["bucket"]): r["cnt"] for r in cms_merge(half_a, half_b).collect()
    }
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert merged == whole


def test_histogram_quantiles_error_bound_and_constant_column(spark):
    """Estimates must sit within one bin width of the exact quantile
    (the explicit error bound), and a constant column short-circuits
    instead of dividing by zero bin width."""
    from hydraide_spark.functions.sketches import histogram_quantiles

    import random

    rng = random.Random(21)
    vals = [rng.uniform(0.0, 1000.0) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    bins = 128
    width = (max(vals) - min(vals)) / bins
    sv = sorted(vals)
    for q, est in histogram_quantiles(df, "value", [0.1, 0.5, 0.9, 0.99], bins):
        exact = sv[min(int(q * len(sv)), len(sv) - 1)]
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)

    const = spark.createDataFrame([(7.5,)] * 10, "value double")
    got = histogram_quantiles(const, "value", [0.1, 0.9])
    assert got == [(0.1, 7.5), (0.9, 7.5)]


def test_histogram_null_values_excluded_not_crashing(spark):
    """NULL values must be excluded up front: before the fix a NULL bin
    row crashed histogram_quantiles' driver sort (None vs int), and
    histogram_bins_fixed emitted a phantom NULL-bin cell."""
    from hydraide_spark.functions.sketches import (
        histogram_bins,
        histogram_bins_fixed,
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,), (4.0,)], "value double"
    )
    got = histogram_quantiles(df, "value", [0.5], bins=4)
    assert len(got) == 1 and 1.0 <= got[0][1] <= 4.0
    bins = histogram_bins(df, "value", bins=4).collect()
    assert all(r["bin"] is not None for r in bins)
    assert sum(r["cnt"] for r in bins) == 4  # NULLs not counted anywhere
    fixed = histogram_bins_fixed(df, "value", 0.0, 5.0, bins=4).collect()
    assert all(r["bin"] is not None for r in fixed)
    assert sum(r["cnt"] for r in fixed) == 4

    all_null = spark.createDataFrame([(None,), (None,)], "value double")
    got = histogram_quantiles(all_null, "value", [0.5])
    assert len(got) == 1 and got[0][1] != got[0][1]  # NaN (empty input)


# --- Bloom filter (r13) -------------------------------------------------------


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every inserted value probes 1 (structural — its bits were set);
    absent values mostly probe 0 at the sized FPR."""
    from pyspark.sql import functions as F

    from hydraide_spark.functions.sketches import bloom_build, bloom_probe

    vals = spark.range(500).select(F.col("id").alias("v"))
    bloom = bloom_build(vals, "v", n_bits=1 << 14, k=4)
    present = bloom_probe(bloom, vals, "v", n_bits=1 << 14, k=4)
    assert present.filter("might_contain = 0").count() == 0  # never FN
    absent = spark.range(500, 1500).select(F.col("id").alias("v"))
    fp = bloom_probe(bloom, absent, "v", n_bits=1 << 14, k=4).filter(
        "might_contain = 1"
    ).count()
    # n=500, m=16384, k=4 -> theoretical FPR ~ (1-e^{-kn/m})^4 ~ 1e-4;
    # allow generous slack over 1000 probes
    assert fp <= 5, fp


def test_bloom_merge_equals_union(spark):
    from pyspark.sql import functions as F

    from hydraide_spark.functions.sketches import bloom_build, bloom_merge

    a = spark.range(0, 300).select(F.col("id").alias("v"))
    b = spark.range(200, 600).select(F.col("id").alias("v"))
    merged = bloom_merge(
        bloom_build(a, "v", n_bits=1 << 13, k=3),
        bloom_build(b, "v", n_bits=1 << 13, k=3),
    )
    direct = bloom_build(a.unionByName(b), "v", n_bits=1 << 13, k=3)
    got = {(r.word, r.bits) for r in merged.collect()}
    want = {(r.word, r.bits) for r in direct.collect()}
    assert got == want  # bit_or associativity + insert idempotence


def test_bloom_bits_for_sizing():
    from hydraide_spark.functions.sketches import bloom_bits_for

    m = bloom_bits_for(1_000_000, 0.01)
    assert m >= 9_585_058  # -n ln p / ln^2 2
    assert m & (m - 1) == 0  # power of two
    assert bloom_bits_for(0) == 1 << 10
    # sizing grows with n: the fixed-cardinality trap is rejected
    assert bloom_bits_for(10_000_000, 0.01) > m
