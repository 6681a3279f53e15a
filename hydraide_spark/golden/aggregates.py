"""Golden queries: counts, grouped aggregation, joins, windows, top-k
(SURVEY.md §2.3-§2.6).

The reference has Count/CountMatching only; grouping is structural (one
swamp per group). The Spark engine exposes the idiomatic generalization:
groupBy over any namespace prefix, full joins, window functions, top-k.
Double sums run through DECIMAL so the result is order-independent and
bit-identical to the serial oracle.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..operators import read as R
from ..query import And, Cmp, Op
from . import golden
from ._util import big, dbl, dec, t


@golden(
    "count_per_swamp",
    oracle="""
    SELECT o_orderstatus AS swamp, CAST(COUNT(*) AS BIGINT) AS count
    FROM orders GROUP BY o_orderstatus
    """,
)
def count_per_swamp(spark, sf_dir):
    """Reference `Count` (gateway.go:1396-1480), multi-swamp batch ==
    one grouped count (map-side partial agg, no wide shuffle)."""
    orders = t(spark, sf_dir, "orders").withColumnRenamed("o_orderstatus", "swamp")
    return R.count(orders)


@golden(
    "count_matching",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS count
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount < 0.05
    """,
)
def count_matching(spark, sf_dir):
    """Reference `CountMatching` (swamp.go:2686-2694): FilterGroup count.
    The whole predicate pushes into the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    filt = And(
        [
            Cmp("l_returnflag", Op.EQ, "R"),
            Cmp("l_quantity", Op.GE, 30.0),
            Cmp("l_discount", Op.LT, 0.05),
        ]
    )
    return R.count_matching(li, filt)


@golden(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)) * (1 - CAST(l_discount AS DECIMAL(28,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """Grouped aggregation anchor (TPC-H Q1 shape): 2-col groupBy with
    decimal-exact sums. Partial aggregation map-side, 6-value group key
    space — the shuffle moves ~nothing regardless of input scale."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
            dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            dbl(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@golden(
    "join_star_revenue",
    oracle="""
    SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2)) * (1 - CAST(l.l_discount AS DECIMAL(28,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def join_star_revenue(spark, sf_dir):
    """Join anchor (TPC-H Q3 shape): the capability the reference
    delegates to client-side reverse indexes (SURVEY.md §2.3) is a
    first-class join here. customer is the small dimension -> broadcast;
    orders⋈lineitem co-shuffles on the order key."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dbl(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue")
        )
        .select(big("o_orderkey").alias("o_orderkey"), "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@golden(
    "semi_anti_join",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def semi_anti_join(spark, sf_dir):
    """Reference reverse-index pattern (hydrex: resolve ids, then keyed
    read) as left-semi + left-anti joins — the N+1 collapse of
    SURVEY.md §2.3."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    big_orders = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    pending = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        c.join(big_orders, c.c_custkey == big_orders.o_custkey, "left_semi")
        .join(pending, F.col("c_custkey") == pending.o_custkey, "left_anti")
        .select(big("c_custkey").alias("c_custkey"), "c_name")
    )


@golden(
    "topk_per_group",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3 AND o_custkey <= 100
    """,
)
def topk_per_group(spark, sf_dir):
    """Window anchor (SURVEY.md §2.5): the reference's priority-queue pop
    (`ShiftMatching` top-K) generalized to top-K per group via
    row_number — one shuffle on the partition key."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 100))
        .select(
            big("o_custkey").alias("o_custkey"),
            big("o_orderkey").alias("o_orderkey"),
            "o_totalprice",
        )
    )


@golden(
    "windowed_event_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2
    """,
)
def windowed_event_stats(spark, sf_dir):
    """Reference telemetry shape (proto:2393-2458: windowed call-rate /
    avg-duration): tumbling 1h windows over the event stream, batch
    form. The time bound goes through load_table_time_bounded so it
    reaches the parquet scan as a raw-nanos comparison (row-group
    pruning) instead of stalling above the ns->us conversion."""
    from datetime import datetime

    from ..sources.tables import load_table_time_bounded

    ev = load_table_time_bounded(
        spark, sf_dir, "events", {"ts": (None, datetime(2024, 1, 3))}
    )
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dbl(F.sum(dec("value", scale=6))).alias("total_value"),
        )
    )


@golden(
    "grouping_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def grouping_rollup(spark, sf_dir):
    """Rollup over the namespace hierarchy — the idiomatic reading of the
    reference's "structural grouping" (one swamp per group, SURVEY §2.4):
    counts at every prefix level in one pass."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
        )
    )


@golden(
    "approx_distinct_exact_oracle",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def approx_distinct_exact_oracle(spark, sf_dir):
    """Distinct-count surface. Exact countDistinct here (oracle-checkable);
    `approx_count_distinct` (HLL, no exact-dedup shuffle) is the 100 TB
    path and is exercised in tests/bench where a hash match isn't required."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


@golden(
    "salted_skew_join",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def salted_skew_join(spark, sf_dir):
    """Skew-mitigating salted join (operators/skew.py): lineitem spreads
    each order key over 8 shuffle sub-keys, orders replicates 8x — no
    reducer ever owns a whole hot key. The oracle is the PLAIN join, so
    the gate proves the salting rewrite is semantics-preserving."""
    from ..operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    joined = salted_join(li, o, ["l_orderkey"], n_salts=8)
    return joined.groupBy("l_returnflag").agg(
        big(F.count(F.lit(1))).alias("n_items"),
        dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
    )


@golden(
    "session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sess_no
    """,
)
def session_windows(spark, sf_dir):
    """Session windows (30-min inactivity gap) per user over the event
    stream — the session analogue of the telemetry windows; the same
    `session_window` expression runs under Structured Streaming with a
    watermark. The oracle derives identical sessions via gaps-and-islands
    (LAG >= gap starts a new island), so the built-in operator's
    semantics are pinned exactly: a session ends when the NEXT event is
    >= 30 minutes away; window end = last event + gap (exclusive)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dbl(F.sum(dec("value", scale=6))).alias("total_value"),
        )
        .select(
            big("user_id").alias("user_id"),
            F.col("sw.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@golden(
    "multiway_join_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(28,2)))) AS DOUBLE) AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def multiway_join_volume(spark, sf_dir):
    """TPC-H Q5 shape — the deepest join the star schema supports: one
    fact⋈fact co-shuffle (lineitem⋈orders on the order key) and a
    broadcast chain for the supplier->nation->region dimension spine
    (each under the 64 MB threshold, so Catalyst plans zero extra
    shuffles for them); region's filter prunes before the fact join."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            dbl(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("volume"),
            big(F.count(F.lit(1))).alias("n_items"),
        )
    )


@golden(
    "asof_join_events",
    oracle="""
    SELECT CAST(l.event_id AS BIGINT) AS event_id,
           CAST(l.user_id AS BIGINT) AS user_id,
           l.ts AS click_ts,
           r.ts AS asof_ts,
           r.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of join (operators/asof.py): for every click, the user's most
    recent purchase value at-or-before the click. Union + ordered-window
    formulation — ONE shuffle on user_id, no range-join candidate
    explosion (docstring there argues the 100 TB case). Oracle is
    DuckDB's native ASOF LEFT JOIN, so the gate certifies our
    formulation against an independent as-of implementation."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    res = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return res.select(
        big("event_id").alias("event_id"),
        big("user_id").alias("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("asof_ts"),
        F.col("value_asof"),
    )


@golden(
    "interval_join_incidents",
    oracle="""
    WITH inc AS (
      SELECT event_id AS incident_id, user_id,
             ts AS lo, ts + INTERVAL 6 HOUR AS hi
      FROM events WHERE event_type = 'error'
    )
    SELECT CAST(i.incident_id AS BIGINT) AS incident_id,
           CAST(e.event_id AS BIGINT) AS event_id,
           CAST(e.user_id AS BIGINT) AS user_id,
           e.event_type
    FROM events e JOIN inc i
      ON e.user_id = i.user_id AND e.ts >= i.lo AND e.ts < i.hi
    """,
)
def interval_join_incidents(spark, sf_dir):
    """Range join (operators/range_join.py): attribute every event to
    the same-user error-incident windows [error_ts, +6h) that contain
    it. Grid-cell blocking (grain = the 6h window length, so each
    interval explodes to <= 2 cells) turns the range predicate into an
    equi-join on (user_id, cell) + exact verify — the naive ON-range
    plan is a nested-loop join, O(events x incidents). Oracle is the
    naive formulation in DuckDB: blocked ≡ nested-loop, exactly."""
    from ..operators.range_join import interval_join

    ev = t(spark, sf_dir, "events")
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("hi"),
    )
    points = ev.select("event_id", "user_id", "ts", "event_type")
    res = interval_join(
        points, incidents, ts_col="ts", lo_col="lo", hi_col="hi",
        keys=["user_id"], grain_seconds=6 * 3600,
    )
    return res.select(
        big("incident_id").alias("incident_id"),
        big("event_id").alias("event_id"),
        big("user_id").alias("user_id"),
        "event_type",
    )


@golden(
    "sliding_window_event_stats",
    oracle="""
    WITH ev AS (
      SELECT event_type, value, epoch_us(ts) AS eus FROM events
    ),
    exploded AS (
      SELECT event_type, value,
             ((eus // 900000000) * 900000000 - u.k * 900000000) AS ws_us
      FROM ev, unnest(range(0, 4)) AS u(k)
    )
    SELECT CAST(ws_us // 1000000 AS BIGINT) AS window_start_s,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM exploded
    GROUP BY ws_us, event_type
    """,
)
def sliding_window_event_stats(spark, sf_dir):
    """SLIDING (hopping) event-time windows — 1 h windows every 15 min,
    so each event lands in exactly 4 overlapping windows (window =
    4 x slide): the dashboard shape tumbling windows can't give
    (smooth rates without 1 h quantization). Spark's window() expands
    each row to its windows BEFORE the grouped aggregate — same
    partial-agg shuffle as tumbling, x4 rows; the oracle replays the
    epoch-aligned window starts with integer µs arithmetic and the
    output keys are integer epoch seconds, so no timestamp rendering
    is compared. Value sums through DECIMAL as ever."""
    from ..sources.tables import epoch_us, load_table

    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    grouped = (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dbl(F.sum(dec("value", scale=6))).alias("total_value"),
        )
        .withColumn("ws", F.col("w.start"))
    )
    return grouped.select(
        (epoch_us(grouped, "ws") / F.lit(1_000_000))
        .cast("bigint")
        .alias("window_start_s"),
        "event_type",
        big("n_events").alias("n_events"),
        "total_value",
    )
