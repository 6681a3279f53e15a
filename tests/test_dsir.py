"""DSIR importance resampling (functions/sampling.py, round 12).

Pins:
- the model discriminates: a doc built purely of target-domain grams
  outranks one built purely of off-domain grams,
- the DECIMAL score accumulator never loses a scale digit (the Spark
  decimal(38,12)+decimal(38,12) -> decimal(38,11) overflow trap): the
  per-doc score equals the exact Python-decimal replay,
- the fast path (xxhash64 buckets) selects k rows with the same API,
- the selection plan is TakeOrderedAndProject (per-partition heaps),
  never a global sort or a corpus-wide single-partition window,
- model size is exactly n_buckets regardless of corpus size.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from hydraide_spark.functions.sampling import (
    dsir_bucket_counts,
    dsir_grams,
    dsir_logratios,
    dsir_score,
    dsir_topk,
)
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _corpora(spark):
    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta") for i in range(8)],
        "id long, text string",
    )
    raw = spark.createDataFrame(
        [(100, "alpha beta gamma delta alpha beta gamma"), (101, "zig zag zog quux zig zag")],
        "id long, text string",
    )
    return target, raw


def test_dsir_discriminates_target_domain(spark):
    target, raw = _corpora(spark)
    lr = dsir_logratios(target, raw, "text", n_buckets=32, salt="t")
    assert len(lr) == 32 and all(isinstance(v, Decimal) for v in lr)
    out = dsir_topk(raw, "id", "text", lr, 2, salt="t").collect()
    ranked = [r.id for r in sorted(out, key=lambda r: r.rank)]
    # the target-vocabulary doc must outrank the off-domain doc
    assert ranked == [100, 101]
    scores = {r.id: r.dsir_score for r in out}
    assert scores[100] > scores[101]


def test_dsir_score_matches_exact_decimal_replay(spark):
    """The score column is a DECIMAL-exact sum of the quantized bucket
    log-ratios: replay it per doc with Python Decimals (exact by
    construction) and require bit-equality — this is the regression
    test for the decimal-overflow scale-drop trap."""
    target, raw = _corpora(spark)
    docs = load_table(spark, SF, "documents").limit(40)
    lr = dsir_logratios(target, raw, "text", n_buckets=16, salt="x")
    got = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", dsir_score(F.col("text"), lr, salt="x").alias("s")
        ).collect()
    }
    # independent replay: explode grams, bucket via the same Spark
    # expression (the hashing itself is pinned by the oracle gate),
    # then sum in Python Decimal
    rows = docs.select(
        "doc_id", F.explode(dsir_grams(F.col("text"))).alias("g")
    ).select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("g"), F.lit("x"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 16
        ).alias("b"),
    ).collect()
    exact: dict = {}
    for r in rows:
        exact[r.doc_id] = exact.get(r.doc_id, Decimal(0)) + lr[r.b]
    for d, s in got.items():
        assert s == exact[d], f"doc {d}: spark {s} != exact {exact[d]}"


def test_dsir_fast_path_and_model_shape(spark):
    docs = load_table(spark, SF, "documents").limit(200)
    target = docs.filter(F.col("lang") == "zh")
    lr = dsir_logratios(target, docs, "text", n_buckets=64, method="xxhash64")
    assert len(lr) == 64
    out = dsir_topk(docs, "doc_id", "text", lr, 10, method="xxhash64")
    rows = out.collect()
    assert len(rows) == 10
    assert sorted(r.rank for r in rows) == list(range(1, 11))
    counts = dsir_bucket_counts(docs, "text", 64, method="xxhash64")
    assert counts.count() <= 64


def test_dsir_selection_is_take_ordered(spark):
    docs = load_table(spark, SF, "documents")
    target = docs.filter(F.col("lang") == "de")
    lr = dsir_logratios(target, docs, "text", n_buckets=16, salt="p")
    plan = dsir_topk(docs, "doc_id", "text", lr, 5, salt="p")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the rank window runs AFTER the limit (over <= k rows): in plan
    # text the Window node sits ABOVE TakeOrderedAndProject
    assert "Window" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_dsir_tagged_one_pass_equals_two_pass(spark):
    """dsir_logratios_tagged (one gram explode, conditional counts)
    produces the IDENTICAL model to the two-pass fit when the target
    is a subset predicate — integer counts are the sufficient
    statistic."""
    from pyspark.sql import functions as F

    from hydraide_spark.functions.sampling import (
        dsir_logratios,
        dsir_logratios_tagged,
    )

    docs = load_table(spark, SF, "documents").limit(120)
    two = dsir_logratios(
        docs.filter(F.col("lang") == "zh"), docs, "text", n_buckets=32, salt="q"
    )
    one = dsir_logratios_tagged(
        docs, F.col("lang") == "zh", "text", n_buckets=32, salt="q"
    )
    assert one == two


def test_dsir_threshold_select_is_scan_side(spark):
    """The threshold form must be a single map-only pass: score
    expression + DECIMAL compare on the scan — ZERO exchanges in the
    physical plan of the select leg (the 100 TB argument: selecting a
    corpus fraction never funnels through a top-k or a shuffle)."""
    from hydraide_spark.functions.sampling import (
        dsir_logratios,
        dsir_threshold_select,
        dsir_topk,
    )
    from hydraide_spark.plans.inspect import physical_plan

    target, raw = _corpora(spark)
    docs = load_table(spark, SF, "documents")
    lr = dsir_logratios(target, raw, "text", n_buckets=16, salt="z")
    sel = dsir_threshold_select(docs, "doc_id", "text", lr, min_score="0.0", salt="z")
    plan = physical_plan(sel)
    assert "Exchange" not in plan, plan
    # membership agrees with the topk scores above the cut
    k = dsir_topk(docs, "doc_id", "text", lr, 500, salt="z")
    above = {r.doc_id for r in k.collect() if r.dsir_score >= 0}
    got = {r.doc_id for r in sel.select("doc_id").collect()}
    assert above == got


def test_dsir_threshold_calibration(spark):
    """The quantile-calibrated threshold keeps ~keep_fraction of the
    corpus, and the calibration is deterministic (same sample, same
    cut, every run)."""
    from hydraide_spark.functions.sampling import (
        dsir_logratios,
        dsir_threshold_from_quantile,
        dsir_threshold_select,
    )

    target, raw = _corpora(spark)
    docs = load_table(spark, SF, "documents")
    lr = dsir_logratios(target, raw, "text", n_buckets=16, salt="c")
    thr1 = dsir_threshold_from_quantile(
        docs, "doc_id", "text", lr, keep_fraction=0.3, sample_fraction=0.5, salt="c"
    )
    thr2 = dsir_threshold_from_quantile(
        docs, "doc_id", "text", lr, keep_fraction=0.3, sample_fraction=0.5, salt="c"
    )
    assert thr1 == thr2
    n_all = docs.count()
    n_kept = dsir_threshold_select(
        docs, "doc_id", "text", lr, min_score=thr1, salt="c"
    ).count()
    assert 0.15 * n_all <= n_kept <= 0.45 * n_all  # ~30% within sample noise
