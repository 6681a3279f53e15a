"""Golden query: mergeable HLL distinct-count sketches
(functions/sketches.py) — the 100 TB replacement for exact global
distincts (SURVEY §2.4 extension; reference has only per-swamp Count
and exact Uint32Slice sets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.sketches import hll_group_sketches, hll_rollup
from . import golden
from ._util import big, t


@golden(
    "hll_distinct_rollup",
    oracle="""
    SELECT event_type AS scope,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS scope, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    """,
)
def hll_distinct_rollup(spark, sf_dir):
    """Per-event-type distinct users via HLL sketches, PLUS a global row
    computed by union-merging the stored per-type sketches — no second
    pass over raw events. The shuffle carries one sketch per type
    instead of every (type, user) pair, and the stored sketches
    re-aggregate to any coarser grouping later (the pre-aggregated-cube
    pattern).

    Oracle note: DataSketches HLL is EXACT below its coupon-list
    threshold (~thousands of distincts at lg_k=14), which holds at every
    test sf (max 1500 distinct users at sf0.1) — so exact COUNT(DISTINCT)
    is a valid oracle here. Beyond the threshold the operator degrades to
    ±~1% estimates; tests/test_sketches.py pins that error bound in the
    dense regime separately."""
    ev = t(spark, sf_dir, "events")
    per_type = hll_group_sketches(ev, ["event_type"], "user_id", lg_k=14)
    per_type_rows = per_type.select(
        F.col("event_type").alias("scope"), big("distinct_est").alias("distinct_users")
    )
    global_row = hll_rollup(per_type, []).select(
        F.lit("ALL").alias("scope"), big("distinct_est").alias("distinct_users")
    )
    return per_type_rows.unionByName(global_row)
