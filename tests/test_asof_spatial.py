"""As-of join and spatial radius-join unit tests: semantics against
pandas merge_asof / a brute-force cross join (the independent
evaluators), plan-shape guarantees (no cartesian product on the
blocked spatial path), tie/tolerance/direction edges.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import Row, functions as F

from hydraide_spark.operators.asof import asof_join
from hydraide_spark.operators.spatial import radius_pairs

T0 = datetime(2024, 1, 1)


def ts(mins):
    return T0 + timedelta(minutes=mins)


def test_asof_backward_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(5)), (3, "u2", ts(1)), (4, "u3", ts(9))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts(5), 50.0),   # equal-ts tie: must match left event 2
            ("u1", ts(7), 70.0),
            ("u2", ts(2), 20.0),   # after u2's only click: no match
        ],
        "user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["value_asof"], r["asof_ts"])
        for r in asof_join(
            left, right, on="user_id", value_cols=["value"]
        ).collect()
    }
    assert out[1] == (70.0, ts(7))  # latest at-or-before 10
    assert out[2] == (50.0, ts(5))  # equal ts matches (inclusive)
    assert out[3] == (None, None)  # right row is in the future
    assert out[4] == (None, None)  # key never seen on the right


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", ts(12), 12.0), ("u1", ts(30), 30.0)],
        "user_id string, ts timestamp, value double",
    )
    fwd = asof_join(left, right, on="user_id", value_cols=["value"], direction="forward")
    assert fwd.collect()[0]["value_asof"] == 12.0  # earliest at-or-after

    tight = asof_join(
        left, right, on="user_id", value_cols=["value"], direction="forward",
        tolerance_seconds=60.0,
    )
    assert tight.collect()[0]["value_asof"] is None  # 2-min gap > 1-min tolerance


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    lrows = [
        (i, f"u{rng.randrange(5)}", ts(rng.randrange(500))) for i in range(80)
    ]
    rrows = [
        (f"u{rng.randrange(5)}", ts(rng.randrange(500)), float(i)) for i in range(60)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id string, ts timestamp, value double")
    got = (
        asof_join(left, right, on="user_id", value_cols=["value"], right_tiebreak=["value"])
        .select("event_id", "value_asof")
        .toPandas()
        .set_index("event_id")["value_asof"]
        .to_dict()
    )

    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = (
        pd.DataFrame(rrows, columns=["user_id", "ts", "value"])
        .sort_values(["ts", "value"])  # deterministic among equal (key, ts)
    )
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    exp = exp.set_index("event_id")["value"].to_dict()
    # no duplicate (user, ts) pairs in rrows? rng may create them — then both
    # engines pick the LAST in their respective orders; align by value sort.
    for k, v in exp.items():
        g = got[k]
        assert (pd.isna(v) and (g is None or pd.isna(g))) or g == v, (k, g, v)


def _brute_force_pairs(points, radius):
    out = set()
    for i, (ida, la, na) in enumerate(points):
        for idb, lb, nb in points[i + 1:]:
            if (la, na) == (0.0, 0.0) or (lb, nb) == (0.0, 0.0):
                continue
            rl1, rl2 = math.radians(la), math.radians(lb)
            a = (
                math.sin(math.radians(lb - la) / 2) ** 2
                + math.cos(rl1) * math.cos(rl2) * math.sin(math.radians(nb - na) / 2) ** 2
            )
            d = 2 * 6371.0088 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
            if d <= radius:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_radius_pairs_match_brute_force(spark):
    rng = random.Random(11)
    points = [
        (i, 47.0 + rng.random() * 0.5, 18.5 + rng.random() * 0.7) for i in range(120)
    ]
    points += [(900, 0.0, 0.0)]  # Null Island: always excluded
    df = spark.createDataFrame(points, "id long, lat double, lng double")
    got = {
        (r["id_l"], r["id_r"])
        for r in radius_pairs(df, "id", "lat", "lng", 8.0).collect()
    }
    assert got == _brute_force_pairs(points, 8.0)
    assert all(l < r for l, r in got)


def test_radius_pairs_cross_cell_boundary(spark):
    # two points straddling a cell boundary, well within radius
    df = spark.createDataFrame(
        [(1, 47.0449, 19.0), (2, 47.0451, 19.0), (3, 47.5, 19.0)],
        "id long, lat double, lng double",
    )
    got = {(r["id_l"], r["id_r"]) for r in radius_pairs(df, "id", "lat", "lng", 5.0).collect()}
    assert got == {(1, 2)}


def test_radius_pairs_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, 47.0, 19.0), (2, 47.1, 19.1)], "id long, lat double, lng double"
    )
    plan = radius_pairs(df, "id", "lat", "lng", 5.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
