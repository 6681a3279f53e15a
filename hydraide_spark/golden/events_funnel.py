"""Golden queries: event-sequence analytics — ordered funnel
conversion and weekly retention cohorts over the events table
(beyond-parity capability: the reference's subscription model delivers
raw event streams, SURVEY §2.9; these are the standard analyses a
product team runs ON those events).

Both are pure DataFrame compositions with engine-exact arithmetic:
step ordering compares timestamps (µs-resolution testdata, identical
in both engines), durations aggregate as INTEGER epoch-microsecond
differences through DECIMAL, and cohort math is date_trunc + integer
day arithmetic — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import golden
from ._util import big, memo_golden, t


@golden(
    "funnel_conversion_events",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    stages AS (
      SELECT 'step1_view' AS stage, COUNT(*) AS users,
             CAST(NULL AS BIGINT) AS total_latency_us FROM v
      UNION ALL
      SELECT 'step2_click', COUNT(*),
             CAST(SUM(CAST(date_diff('microsecond', v.t1, c.t2) AS DECIMAL(28,0))) AS BIGINT)
      FROM c JOIN v ON c.user_id = v.user_id
      UNION ALL
      SELECT 'step3_purchase', COUNT(*),
             CAST(SUM(CAST(date_diff('microsecond', v.t1, p.t3) AS DECIMAL(28,0))) AS BIGINT)
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT stage, CAST(users AS BIGINT) AS users, total_latency_us
    FROM stages
    """,
)
@memo_golden("funnel_conversion_events")
def funnel_conversion_events(spark, sf_dir):
    """Ordered funnel view -> click -> purchase: a user advances a step
    only with an event strictly AFTER their previous step's first
    completion (the standard product-analytics funnel, not a bag-of-
    events count). Each step is a filtered groupBy-min plus an
    inequality join against the previous step's (tiny) per-user frame
    — at 100 TB the fact is scanned once per step with the step filter
    pushed down, and every join side after step 1 is user-level (not
    event-level). Latency totals are exact integer epoch-µs sums."""
    from ..sources.tables import epoch_us

    ev = t(spark, sf_dir, "events")

    def first_after(event_type, prev, prev_t):
        e = ev.filter(F.col("event_type") == event_type).alias("e")
        return (
            e.join(
                prev.alias("p"),
                (F.col("e.user_id") == F.col("p.user_id"))
                & (F.col("e.ts") > F.col(f"p.{prev_t}")),
            )
            .groupBy(F.col("e.user_id").alias("user_id"))
            .agg(F.min("e.ts").alias("t"))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1").withColumnRenamed("t", "t2")
    p = first_after("purchase", c, "t2").withColumnRenamed("t", "t3")

    def stage(name, df, t_end):
        if t_end is None:
            return df.agg(
                F.lit(name).alias("stage"),
                big(F.count(F.lit(1))).alias("users"),
                F.lit(None).cast("bigint").alias("total_latency_us"),
            )
        joined = df.join(v, "user_id")
        lat = epoch_us(joined, t_end) - epoch_us(joined, "t1")
        return joined.agg(
            F.lit(name).alias("stage"),
            big(F.count(F.lit(1))).alias("users"),
            F.sum(lat.cast("decimal(28,0)")).cast("bigint").alias("total_latency_us"),
        )

    return (
        stage("step1_view", v, None)
        .unionByName(stage("step2_click", c, "t2"))
        .unionByName(stage("step3_purchase", p, "t3"))
    )


@golden(
    "retention_cohorts_events",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week,
                       date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts_events(spark, sf_dir):
    """Weekly retention cohorts: users grouped by the week of their
    first event; each later active week counts them at its integer
    week offset — the retention matrix every growth dashboard draws.
    One groupBy-min over the fact, a user-level join back (the firsts
    frame is per-user — it broadcasts at any realistic user count),
    a distinct on (cohort, offset, user), and a tiny final count.
    date_trunc('week') is ISO-Monday in both engines; offsets are pure
    integer day arithmetic."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        big(F.count(F.lit(1))).alias("active_users")
    ).select(
        F.col("cohort_week").cast("date").alias("cohort_week"),
        big("week_offset").alias("week_offset"),
        "active_users",
    )


@golden(
    "events_props_json_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_json_stats(spark, sf_dir):
    """Semi-structured props: the JSON payload column (the reference's
    msgpack-typed treasure values, SURVEY §1.3, carried as JSON here)
    is queried WITHOUT a parse-to-struct ETL step — get_json_object
    extracts the field inside the scan projection and the aggregate is
    ordinary integer arithmetic. At 100 TB the JSON decode rides the
    columnar scan (one pass, no shuffle added); promoting hot fields to
    real columns is a storage-layout decision, not a query rewrite."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        big(F.count(F.lit(1))).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    ).select("event_type", "n", big("sum_k").alias("sum_k"),
             big("min_k").alias("min_k"), big("max_k").alias("max_k"))


@golden(
    "error_burst_islands",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                   OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM events WHERE event_type = 'error'
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM e
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(island_id AS BIGINT) AS burst_no,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           MIN(ts) AS burst_start,
           MAX(ts) AS burst_end
    FROM islands
    GROUP BY user_id, island_id
    HAVING COUNT(*) >= 3
    """,
)
def error_burst_islands(spark, sf_dir):
    """Error-burst detection — the gaps-and-islands pattern (the batch
    analogue of MATCH_RECOGNIZE / CEP sequence matching): consecutive
    'error' events per user belong to one burst while gaps stay under
    30 minutes; bursts of >= 3 errors surface with their bounds. Two
    per-user windows (lag, running sum) over the error-filtered scan —
    the filter prunes the fact before any shuffle, and the window
    partitions by user so no global sort exists. All decisions are
    timestamp comparisons and integer counts: engine-exact."""
    from pyspark.sql import Window as W

    from ..sources.tables import epoch_us

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = W.partitionBy("user_id").orderBy("ts")
    # epoch µs as a long column first (ts may be TIMESTAMP_NTZ, which
    # does not cast to long); the 30-min gap is 1.8e9 µs exactly
    evu = ev.select("user_id", "ts", epoch_us(ev, "ts").alias("_tus"))
    lagged = evu.select(
        "user_id", "ts",
        F.when(
            F.lag("_tus").over(w).isNull()
            | (F.col("_tus") - F.lag("_tus").over(w) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0).alias("new_island"),
    )
    islands = lagged.withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("user_id", "island_id")
        .agg(
            big(F.count(F.lit(1))).alias("n_errors"),
            F.min("ts").alias("burst_start"),
            F.max("ts").alias("burst_end"),
        )
        .filter(F.col("n_errors") >= 3)
        .select(
            big("user_id").alias("user_id"),
            big("island_id").alias("burst_no"),
            "n_errors", "burst_start", "burst_end",
        )
    )


@golden(
    "anomaly_outlier_events",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n,
             s / n AS mean,
             sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS std
      FROM m
    )
    SELECT CAST(e.event_id AS BIGINT) AS event_id,
           e.event_type, e.value,
           round((e.value - st.mean) / st.std, 4) AS zscore
    FROM events e JOIN stats st ON e.event_type = st.event_type
    WHERE abs(e.value - st.mean) > 3.0 * st.std
    """,
)
def anomaly_outlier_events(spark, sf_dir):
    """Z-score anomaly detection per event type: moments from EXACT
    DECIMAL sums (value and value² at scale 6 — engine-identical), so
    mean/std and the 3-sigma boundary are the same IEEE doubles in
    both engines (variance floored at 0 before sqrt: a near-constant
    group's tiny negative rounding residue would otherwise go NaN,
    whose comparison semantics DIFFER between engines — Spark treats
    NaN > x as false, DuckDB sorts NaN greatest). One grouped
    aggregate + a broadcast stats join back to the scan: two passes,
    no shuffle of the fact beyond the tiny per-type partials."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mean = F.col("s") / F.col("n")
    stats = m.select(
        "event_type",
        mean.alias("mean"),
        F.sqrt(
            F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mean")) > F.lit(3.0) * F.col("std"))
        .select(
            big("event_id").alias("event_id"),
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mean")) / F.col("std"), 4).alias("zscore"),
        )
    )
