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


@golden(
    "cms_user_frequencies",
    oracle="""
    WITH depths AS (SELECT unnest([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT d, substr(md5(d || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket
      FROM events CROSS JOIN depths
    ),
    cms AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    probes AS (SELECT unnest(range(0, 40)) AS user_id),
    pb AS (
      SELECT user_id, d,
             substr(md5(d || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket
      FROM probes CROSS JOIN depths
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
    FROM pb LEFT JOIN cms USING (d, bucket)
    GROUP BY user_id
    """,
)
def cms_user_frequencies(spark, sf_dir):
    """Count-Min frequency estimates for 40 probe users over the events
    stream (functions/sketches.py::cms_build/cms_estimate). The bucket
    key is the first two hex chars of md5(d ':' value) — bit-identical
    in any engine, so the oracle replays the FULL sketch (cells,
    collisions, min-over-depth) exactly, not just the estimates'
    ballpark. The shuffle carries ≤ depth×256 cells per partition
    regardless of the user keyspace; probing broadcasts the cell frame."""
    from ..functions.sketches import cms_build, cms_estimate

    ev = t(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id", depth=4)
    probes = spark.range(0, 40).select(F.col("id").alias("user_id"))
    out = cms_estimate(cms, probes, "user_id", depth=4)
    return out.select(big("user_id").alias("user_id"), big("est").alias("est"))
