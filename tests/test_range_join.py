"""Range-join semantics: brute-force equivalence on random data,
half-open boundary rules, exactly-once across cell boundaries, empty
windows, keyless mode, and the no-nested-loop plan invariant."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from hydraide_spark.operators.range_join import interval_join

T0 = datetime(2024, 5, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _frames(spark, points, intervals):
    p = spark.createDataFrame(points, "pid long, k long, ts timestamp")
    i = spark.createDataFrame(
        intervals, "iid long, k long, lo timestamp, hi timestamp"
    )
    return p, i


def test_brute_force_equivalence_random(spark):
    rng = random.Random(7)
    points = [(n, rng.randrange(3), _ts(rng.uniform(0, 5000))) for n in range(300)]
    intervals = []
    for n in range(80):
        lo = rng.uniform(0, 4800)
        intervals.append((n, rng.randrange(3), _ts(lo), _ts(lo + rng.uniform(1, 400))))
    p, i = _frames(spark, points, intervals)
    # grain much smaller than typical interval: many cells per interval,
    # still exactly-once
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(p, i, "ts", "lo", "hi", keys=["k"], grain_seconds=3600).collect()
    }
    exp = {
        (pid, iid)
        for pid, pk, pts in points
        for iid, ik, lo, hi in intervals
        if pk == ik and lo <= pts < hi
    }
    assert got == exp


def test_half_open_boundaries_and_empty_window(spark):
    p, i = _frames(
        spark,
        [(1, 0, _ts(0)), (2, 0, _ts(60)), (3, 0, _ts(30))],
        # [0, 60): includes lo point, excludes hi point; [45, 45): empty
        [(10, 0, _ts(0), _ts(60)), (11, 0, _ts(45), _ts(45))],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(p, i, "ts", "lo", "hi", keys=["k"]).collect()
    )
    assert got == [(1, 10), (3, 10)]


def test_exactly_once_across_cell_boundaries(spark):
    # interval spans many cells; each contained point matches once
    p, i = _frames(
        spark,
        [(n, 0, _ts(n * 30)) for n in range(10)],
        [(10, 0, _ts(15), _ts(255))],
    )
    rows = interval_join(p, i, "ts", "lo", "hi", keys=["k"], grain_seconds=60).collect()
    pids = sorted(r["pid"] for r in rows)
    assert pids == [1, 2, 3, 4, 5, 6, 7, 8]  # 30..240 min, each once


def test_keyless_mode(spark):
    p = spark.createDataFrame([(1, _ts(10)), (2, _ts(100))], "pid long, ts timestamp")
    i = spark.createDataFrame(
        [(10, _ts(0), _ts(50))], "iid long, lo timestamp, hi timestamp"
    )
    got = [(r["pid"], r["iid"]) for r in interval_join(p, i, "ts", "lo", "hi").collect()]
    assert got == [(1, 10)]


def test_plan_has_no_nested_loop(spark):
    p, i = _frames(spark, [(1, 0, _ts(0))], [(10, 0, _ts(0), _ts(60))])
    out = interval_join(p, i, "ts", "lo", "hi", keys=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
