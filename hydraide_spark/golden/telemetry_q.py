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


def _pseudo_err_stats(spark, sf_dir):
    """events → error-carrying stats rows for the top_errors rollup.
    Pseudo timestamps are the (unique) event_ids so first/last-
    occurrence picks are deterministic cross-engine; every 17th event
    fails with a rotating error kind, and the message is a 50-char
    padded stem (shared per kind × op — the grouping key) plus a
    per-event tail (exercises both the 50-char key truncation and the
    100-char display truncation)."""
    ev = load_table(spark, sf_dir, "events")
    err = F.col("event_id") % 17 == 0
    kind = F.element_at(
        F.array(
            F.lit("CompressionError"),
            F.lit("ValidationError"),
            F.lit("PermissionError"),
        ),
        (F.expr("event_id div 17") % 3 + 1).cast("int"),
    )
    msg = F.concat(
        F.rpad(
            F.concat(kind, F.lit(" while scanning "), F.col("event_type")),
            50,
            ".",
        ),
        F.lit(" id="),
        F.col("event_id").cast("string"),
    )
    return ev.select(
        F.col("event_id").alias("ts_us"),
        F.col("event_type").alias("op"),
        F.lit(0.0).alias("wall_ms"),
        (~err).alias("ok"),
        F.array(
            F.col("event_type"),
            F.concat(F.lit("tbl_"), (F.col("user_id") % 3).cast("string")),
        ).alias("tables"),
        F.when(err, kind).alias("err_kind"),
        F.when(err, msg).alias("err_msg"),
    )


_ERR_STATS_SQL = """
    SELECT event_id AS ts_us,
           event_type AS op,
           0.0 AS wall_ms,
           event_id % 17 <> 0 AS ok,
           [event_type, 'tbl_' || CAST(user_id % 3 AS VARCHAR)] AS tables,
           CASE WHEN event_id % 17 = 0 THEN
             ['CompressionError', 'ValidationError', 'PermissionError']
               [CAST((event_id // 17) % 3 AS INTEGER) + 1]
           END AS err_kind,
           CASE WHEN event_id % 17 = 0 THEN
             rpad(['CompressionError', 'ValidationError', 'PermissionError']
                    [CAST((event_id // 17) % 3 AS INTEGER) + 1]
                  || ' while scanning ' || event_type, 50, '.')
             || ' id=' || CAST(event_id AS VARCHAR)
           END AS err_msg
    FROM events
"""


@golden(
    "telemetry_top_errors",
    oracle=f"""
    WITH stats AS ({_ERR_STATS_SQL}),
    keyed AS (
      SELECT err_kind,
             substring(err_msg, 1, 50) AS _key,
             substring(err_msg, 1, 100) AS _disp,
             ts_us,
             array_to_string(tables, ',') AS _scanned
      FROM stats WHERE NOT ok
    )
    SELECT err_kind,
           min_by(_disp, ts_us) AS err_msg,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(MAX(ts_us) AS BIGINT) AS last_ts_us,
           max_by(_scanned, ts_us) AS last_scanned
    FROM keyed
    GROUP BY err_kind, _key
    ORDER BY n_errors DESC, err_kind ASC, _key ASC
    LIMIT 5
    """,
)
def telemetry_top_errors(spark, sf_dir):
    """The most-frequent-errors view (operators/telemetry.py::
    top_errors; reference GetErrorDetails / TelemetryStats TopErrors,
    telemetry.go:311-326,367): group by kind + 50-char message prefix,
    first-occurrence display message (min_by), last-occurrence
    timestamp and scanned tables (max_by), top-5 by count with a
    deterministic (kind, key) tiebreak."""
    from ..operators.telemetry import top_errors

    stats = _pseudo_err_stats(spark, sf_dir)
    out = top_errors(stats, k=5)
    return out.select(
        F.col("err_kind"),
        F.col("err_msg"),
        big("n_errors").alias("n_errors"),
        big("last_ts_us").alias("last_ts_us"),
        F.col("last_scanned"),
    )


@golden(
    "telemetry_stats_summary",
    oracle=f"""
    WITH stats AS ({_STATS_SQL})
    SELECT CAST(COUNT(*) AS BIGINT) AS total_calls,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS error_count,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) * 100 AS DOUBLE) / COUNT(*)
             AS error_rate_pct,
           CAST(SUM(CAST(wall_ms AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
             AS avg_wall_ms,
           CAST(COUNT(DISTINCT op) AS BIGINT) AS n_distinct_ops
    FROM stats
    """,
)
def telemetry_stats_summary(spark, sf_dir):
    """The GetTelemetryStats one-row summary (proto:599,
    telemetry.go:284-369; operators/telemetry.py::stats_summary):
    error rate ×100 as the reference computes it, average wall time
    summed through DECIMAL so parallel order can't drift the double."""
    from ..operators.telemetry import stats_summary

    stats = _pseudo_stats(spark, sf_dir)
    out = stats_summary(stats)
    return out.select(
        big("total_calls").alias("total_calls"),
        big("error_count").alias("error_count"),
        F.col("error_rate_pct").cast("double").alias("error_rate_pct"),
        F.col("avg_wall_ms"),
        big("n_distinct_ops").alias("n_distinct_ops"),
    )


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
