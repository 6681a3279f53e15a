"""Golden queries for the telemetry rollup surfaces (reference
telemetry.go / proto:2393-2458): the rollups are plain aggregates over
a stats table, so the gate drives them with a DETERMINISTIC pseudo-
stats frame derived from the events table (runtime listener rows can't
be oracle-compared; the listener itself is covered by
tests/test_telemetry.py). This proves the rollup arithmetic — windowed
call/error rates, hottest-table counts — exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.telemetry import rolling_rates, top_swamps
from ..sources.tables import epoch_us, load_table
from . import golden
from ._util import big


def _pseudo_stats(spark, sf_dir):
    """events → the stats-table shape: one 'query' per event; the op is
    the event type, wall = value, every 17th call failed, and each
    query 'scanned' its op's table plus one of three user-sharded
    tables."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        epoch_us(ev, "ts").alias("ts_us"),
        F.col("event_type").alias("op"),
        F.col("value").alias("wall_ms"),
        (F.col("event_id") % 17 != 0).alias("ok"),
        F.array(
            F.col("event_type"),
            F.concat(F.lit("tbl_"), (F.col("user_id") % 3).cast("string")),
        ).alias("tables"),
    )


_STATS_SQL = """
    SELECT epoch_us(ts) AS ts_us,
           event_type AS op,
           value AS wall_ms,
           event_id % 17 <> 0 AS ok,
           [event_type, 'tbl_' || CAST(user_id % 3 AS VARCHAR)] AS tables
    FROM events
"""


@golden(
    "telemetry_rolling_rates",
    oracle=f"""
    WITH stats AS ({_STATS_SQL})
    SELECT CAST((ts_us // 3600000000) * 3600000000 AS BIGINT)
             AS window_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_calls,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*)
             AS error_rate
    FROM stats GROUP BY 1
    """,
)
def telemetry_rolling_rates(spark, sf_dir):
    """The call-rate/error-rate RPC pair over hourly windows
    (operators/telemetry.py::rolling_rates). error_rate is one exact
    integer division — cross-engine safe without rounding."""
    stats = _pseudo_stats(spark, sf_dir)
    out = rolling_rates(stats, window_sec=3600)
    return out.select(
        big("window_start_us").alias("window_start_us"),
        big("n_calls").alias("n_calls"),
        big("n_errors").alias("n_errors"),
        F.col("error_rate"),
    )


@golden(
    "telemetry_top_swamps",
    oracle=f"""
    WITH stats AS ({_STATS_SQL})
    SELECT "table", n_scans FROM (
      SELECT t AS "table", CAST(COUNT(*) AS BIGINT) AS n_scans
      FROM (SELECT unnest(tables) AS t FROM stats)
      GROUP BY t
    ) ORDER BY n_scans DESC, "table" ASC LIMIT 5
    """,
)
def telemetry_top_swamps(spark, sf_dir):
    """The hottest-swamp view (operators/telemetry.py::top_swamps):
    most-scanned tables with a deterministic name tiebreak."""
    stats = _pseudo_stats(spark, sf_dir)
    out = top_swamps(stats, k=5)
    return out.select(F.col("table"), big("n_scans").alias("n_scans"))


@golden(
    "telemetry_history",
    oracle=f"""
    WITH stats AS ({_STATS_SQL})
    SELECT CAST((ts_us // 86400000000) * 86400000000 AS BIGINT)
             AS window_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_calls,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_errors,
           MIN(wall_ms) AS min_wall_ms,
           quantile_cont(wall_ms, 0.5) AS p50_wall_ms,
           MAX(wall_ms) AS max_wall_ms
    FROM stats GROUP BY 1
    """,
)
def telemetry_history(spark, sf_dir):
    """The GetHistory RPC analogue (operators/telemetry.py::history):
    per-day calls, errors, and wall-time min/median/max. Spark
    `percentile` and DuckDB `quantile_cont` share the exact
    interpolation definition (rank = (n-1)p), so the median compares
    without rounding — the exact_quantiles_by_flag precedent."""
    from ..operators.telemetry import history

    stats = _pseudo_stats(spark, sf_dir)
    out = history(stats, window_sec=86400)
    return out.select(
        big("window_start_us").alias("window_start_us"),
        big("n_calls").alias("n_calls"),
        big("n_errors").alias("n_errors"),
        F.col("min_wall_ms"),
        F.col("p50_wall_ms"),
        F.col("max_wall_ms"),
    )


@golden(
    "telemetry_slow_queries",
    oracle=f"""
    WITH stats AS ({_STATS_SQL})
    SELECT ts_us, op, wall_ms,
           array_to_string(tables, ',') AS scanned
    FROM stats WHERE ok
    ORDER BY wall_ms DESC, ts_us ASC LIMIT 10
    """,
)
def telemetry_slow_queries(spark, sf_dir):
    """The slowest-operations drill-down (operators/telemetry.py::
    slow_queries) — the 4th and last rollup surface, completing the
    oracle-gated set. Deterministic: wall desc with a timestamp
    tiebreak."""
    from ..operators.telemetry import slow_queries

    stats = _pseudo_stats(spark, sf_dir)
    out = slow_queries(stats, k=10)
    # the gate's value-hash compare cannot factorize array cells —
    # emit the scanned-table list as a joined string
    return out.select(
        big("ts_us").alias("ts_us"),
        F.col("op"),
        F.col("wall_ms"),
        F.concat_ws(",", F.col("tables")).alias("scanned"),
    )
