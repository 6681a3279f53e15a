"""frame_memo discipline (r16 optimization): a memoized golden returns
the SAME lazy plan per (applicationId, key) — and that plan is only a
plan. Every action must still compute the query's output from the
parquet inputs; the memo may never capture data, and a different
sf_dir or a restarted application must rebuild.
"""

from __future__ import annotations

from hydraide_spark.golden._util import _FRAME_MEMO, frame_memo

from conftest import SF_SMOKE


def test_frame_memo_returns_same_plan_and_recomputes_output(spark):
    from hydraide_spark.golden.retrieval_q import retrieval_eval_metrics

    a = retrieval_eval_metrics(spark, SF_SMOKE)
    b = retrieval_eval_metrics(spark, SF_SMOKE)
    # one plan per (app, key): repeat calls skip the build entirely
    assert a is b
    # the memoized frame is a PLAN over the parquet inputs, not data
    plan = a._jdf.queryExecution().analyzed().toString()
    assert "parquet" in plan.lower()
    # actions on the memoized frame recompute the output normally
    rows1 = sorted(map(tuple, a.collect()))
    rows2 = sorted(map(tuple, b.collect()))
    assert rows1 == rows2 and len(rows1) > 0


def test_frame_memo_keys_isolate_sf_dir_and_application(spark):
    calls = []

    def build_a():
        calls.append("a")
        return spark.range(3)

    def build_b():
        calls.append("b")
        return spark.range(4)

    fa = frame_memo(spark, ("t_memo_key", "dirA"), build_a)
    fb = frame_memo(spark, ("t_memo_key", "dirB"), build_b)
    assert fa is not fb and calls == ["a", "b"]
    assert frame_memo(spark, ("t_memo_key", "dirA"), build_a) is fa
    assert calls == ["a", "b"]  # no rebuild on hit
    # keys carry the applicationId, so a restarted app cannot see
    # frames holding dead JVM references
    app = spark.sparkContext.applicationId
    assert any(k[0] == app and k[1] == "t_memo_key" for k in _FRAME_MEMO)


def test_frame_memo_replays_pins_on_hit(spark):
    """A memo HIT must re-pin the build's pin_latest sites: shared
    sites rotated by non-memoized siblings would otherwise evict the
    memoized frame's persisted deps (the _same_plan guard only keeps
    RE-PINNED plans)."""
    from hydraide_spark.functions._cache import (
        _PINNED,
        pin_latest,
        release_pinned,
    )

    site = "t_memo.repin_site"
    release_pinned(site)
    dep = spark.range(7).persist()

    def build():
        pin_latest(site, dep, max_generations=2)
        return spark.range(2)

    fa = frame_memo(spark, ("t_memo_repin",), build)
    assert len(_PINNED[site]) == 1
    # sibling pins with DIFFERENT plans would rotate the dep out...
    other = spark.range(8).persist()
    pin_latest(site, other, max_generations=2)
    # ...but a memo hit re-pins, keeping the dep the youngest generation
    fb = frame_memo(spark, ("t_memo_repin",), build)
    assert fb is fa
    gens = _PINNED[site]
    assert gens[-1][0] is dep
    # rotation now evicts `other`, never the memoized frame's dep
    pin_latest(site, spark.range(9).persist(), max_generations=2)
    live = [d for g in _PINNED[site] for d in g]
    assert dep in live
    release_pinned(site)
    dep.unpersist()
    other.unpersist()
