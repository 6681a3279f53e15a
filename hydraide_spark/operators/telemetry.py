"""Per-query telemetry — the reference's observability subsystem
(``app/server/telemetry/telemetry.go``; ``proto/hydraide.proto:
2393-2458``: rolling call rate, error rate, top swamps, history) as a
Spark-native component.

The reference counts gRPC calls per minute, errors, and which swamps
are touched most. The engine equivalent hangs a
``QueryExecutionListener`` off the session (a Python class implementing
the JVM interface over py4j callbacks — the same mechanism PySpark's
streaming listener uses): every completed action records
(timestamp, operation, wall ms, ok, scanned tables). The scanned-table
list is the swamp analogue — parsed from the executed plan's FileScan
locations, so "top swamps" means "most-scanned tables", exactly the
reference's hottest-data view.

Analysis surfaces mirror the 4 RPCs, each a plain DataFrame rollup over
the recorded stats (windowed call/error rates, top-k scanned tables,
full history) — at scale the stats table is appended to storage and the
rollups are the same queries over the persisted table.
"""

from __future__ import annotations

import re
import threading
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

_SCAN_RE = re.compile(r"FileScan \w+ \S*\[?([^\[\]\n ]*)")
_LOCATION_RE = re.compile(r"Location: \w+\([0-9]* paths\)?\[([^\]]*)\]")


class QueryStatsCollector:
    """Registers as a JVM ``QueryExecutionListener`` and records one
    row per completed action. Driver-side and lock-protected (py4j
    callbacks arrive on their own threads); the per-query cost is one
    plan ``toString`` — no extra Spark jobs."""

    SCHEMA = (
        "ts_us long, op string, wall_ms double, ok boolean, tables array<string>"
    )

    def __init__(self, spark: SparkSession):
        from pyspark.java_gateway import ensure_callback_server_started

        self._spark = spark
        self._mu = threading.Lock()
        self._rows: list[tuple] = []
        ensure_callback_server_started(spark.sparkContext._gateway)
        self._active = True
        spark._jsparkSession.listenerManager().register(self)

    # -- JVM callback interface -------------------------------------------

    def onSuccess(self, funcName, qe, durationNs):  # noqa: N802 (JVM name)
        if self._active:
            self._record(funcName, qe, durationNs / 1e6, True)

    def onFailure(self, funcName, qe, exception):  # noqa: N802 (JVM name)
        if self._active:
            self._record(funcName, qe, 0.0, False)

    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    # -- internals ---------------------------------------------------------

    def _record(self, op: str, qe, wall_ms: float, ok: bool) -> None:
        tables: list[str] = []
        try:
            plan = qe.executedPlan().toString()
            for m in _LOCATION_RE.finditer(plan):
                for path in m.group(1).split(","):
                    path = path.strip().rstrip("/")
                    if path:
                        tables.append(path.rsplit("/", 1)[-1])
        except Exception:
            pass  # a failed query may have no executable plan
        with self._mu:
            self._rows.append(
                (time.time_ns() // 1_000, str(op), float(wall_ms), bool(ok),
                 sorted(set(tables)))
            )

    # -- API ----------------------------------------------------------------

    def unregister(self) -> None:
        """Stop recording. Soft-disable: each py4j conversion of a
        Python callback object creates a NEW JVM proxy, so
        ``listenerManager().unregister(self)`` can never match the
        registered instance by reference — the flag is the reliable
        off-switch (the dormant proxy costs two booleans per query)."""
        self._active = False

    def stats(self) -> DataFrame:
        """The recorded stats as a DataFrame (driver-buffer snapshot;
        at scale, append these rows to a store table instead)."""
        with self._mu:
            rows = list(self._rows)
        return self._spark.createDataFrame(rows, self.SCHEMA)

    def clear(self) -> None:
        with self._mu:
            self._rows.clear()


# -- the 4 RPC analogues (proto:2393-2458), as rollups over the stats -------


def rolling_rates(stats: DataFrame, window_sec: int = 60) -> DataFrame:
    """Rolling call + error counts per tumbling window — the
    call-rate/error-rate pair (telemetry.go's per-minute counters).
    Returns (window_start_us, n_calls, n_errors, error_rate)."""
    win = (F.col("ts_us") / F.lit(window_sec * 1_000_000)).cast("long")
    return (
        stats.groupBy((win * window_sec * 1_000_000).alias("window_start_us"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum((~F.col("ok")).cast("long")).alias("n_errors"),
        )
        .withColumn(
            "error_rate", F.col("n_errors") / F.col("n_calls")
        )
        .orderBy("window_start_us")
    )


def top_swamps(stats: DataFrame, k: int = 10) -> DataFrame:
    """Most-scanned tables (the hottest-swamp view): explode the
    per-query table lists, count, top-k with a name tiebreak."""
    return (
        stats.select(F.explode("tables").alias("table"))
        .groupBy("table")
        .agg(F.count(F.lit(1)).alias("n_scans"))
        .orderBy(F.col("n_scans").desc(), F.col("table").asc())
        .limit(k)
    )


def slow_queries(stats: DataFrame, k: int = 10) -> DataFrame:
    """Slowest successful operations — the history/top-N drill-down."""
    return (
        stats.filter(F.col("ok"))
        .orderBy(F.col("wall_ms").desc(), F.col("ts_us").asc())
        .limit(k)
        .select("ts_us", "op", "wall_ms", "tables")
    )


def history(stats: DataFrame, window_sec: int = 60) -> DataFrame:
    """Full telemetry history: per-window calls, errors, and wall-time
    stats (the GetHistory RPC analogue)."""
    win = (F.col("ts_us") / F.lit(window_sec * 1_000_000)).cast("long")
    return (
        stats.groupBy((win * window_sec * 1_000_000).alias("window_start_us"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum((~F.col("ok")).cast("long")).alias("n_errors"),
            F.min("wall_ms").alias("min_wall_ms"),
            F.expr("percentile(wall_ms, 0.5)").alias("p50_wall_ms"),
            F.max("wall_ms").alias("max_wall_ms"),
        )
        .orderBy("window_start_us")
    )
