"""Telemetry (reference app/server/telemetry/telemetry.go;
proto:2393-2458 — rolling call/error rates, top swamps, history): a
QueryExecutionListener-fed stats table plus the 4 rollup surfaces."""

from __future__ import annotations

import time

import pytest

from hydraide_spark.operators.telemetry import (
    QueryStatsCollector,
    history,
    rolling_rates,
    slow_queries,
    top_swamps,
)


@pytest.fixture()
def collector(spark):
    c = QueryStatsCollector(spark)
    yield c
    c.unregister()


def _drain(collector, min_rows, timeout=15.0):
    """Listener callbacks are async (JVM event queue) — wait for them."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if len(collector.stats().collect()) >= min_rows:
            return
        time.sleep(0.2)
    raise AssertionError(f"telemetry rows never reached {min_rows}")


def test_listener_records_success_failure_and_scanned_tables(spark, collector):
    from hydraide_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    load_table(spark, sf, "orders").count()
    load_table(spark, sf, "lineitem").groupBy("l_returnflag").count().collect()
    with pytest.raises(Exception):
        spark.sql("SELECT assert_true(false, 'boom')").collect()
    _drain(collector, 3)
    rows = collector.stats().collect()
    oks = [r for r in rows if r["ok"]]
    fails = [r for r in rows if not r["ok"]]
    assert len(oks) >= 2 and len(fails) >= 1
    # the failure row carries the exception kind + message (reference
    # telemetry events have ErrorCode/ErrorMsg, telemetry.go:22-23)
    assert any(
        r["err_kind"] and "boom" in (r["err_msg"] or "") for r in fails
    ), [(r["err_kind"], r["err_msg"]) for r in fails]
    assert all(r["err_kind"] is None and r["err_msg"] is None for r in oks)
    scanned = {t for r in oks for t in r["tables"]}
    assert any("orders" in t for t in scanned), scanned
    assert any("lineitem" in t for t in scanned), scanned
    assert all(r["wall_ms"] >= 0 for r in oks)


def test_rollups_mirror_the_four_rpcs(spark, collector):
    from hydraide_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    for _ in range(3):
        load_table(spark, sf, "nation").count()
    load_table(spark, sf, "region").count()
    with pytest.raises(Exception):
        spark.sql("SELECT assert_true(false, 'boom')").collect()
    _drain(collector, 5)
    stats = collector.stats()

    rates = rolling_rates(stats, window_sec=3600).collect()
    assert sum(r["n_calls"] for r in rates) >= 5
    assert sum(r["n_errors"] for r in rates) >= 1
    assert all(0.0 <= r["error_rate"] <= 1.0 for r in rates)

    tops = top_swamps(stats, k=5).collect()
    by_table = {r["table"]: r["n_scans"] for r in tops}
    n_nation = next(v for t, v in by_table.items() if "nation" in t)
    n_region = next(v for t, v in by_table.items() if "region" in t)
    assert n_nation >= 3 and n_region >= 1 and n_nation > n_region

    slow = slow_queries(stats, k=3).collect()
    assert 1 <= len(slow) <= 3
    assert all(r["wall_ms"] >= 0 for r in slow)

    hist = history(stats, window_sec=3600).collect()
    assert all(r["min_wall_ms"] <= r["p50_wall_ms"] <= r["max_wall_ms"] for r in hist)


def test_stats_summary_windowed(spark):
    """GetTelemetryStats summary: the optional window bounds the
    aggregate to the newest window_sec; error rate is the reference's
    x100 percentage."""
    from hydraide_spark.operators.telemetry import stats_summary

    c = QueryStatsCollector(spark)
    c.unregister()
    base = 1_700_000_000_000_000
    c._append((base, "old", 100.0, False, [], "Boom", "x"))          # outside
    c._append((base + 120_000_000, "a", 2.0, True, [], None, None))  # inside
    c._append((base + 150_000_000, "b", 4.0, False, [], "Boom", "y"))
    full = stats_summary(c.stats()).collect()[0]
    assert (full["total_calls"], full["error_count"]) == (3, 2)
    win = stats_summary(c.stats(), window_sec=60).collect()[0]
    assert (win["total_calls"], win["error_count"]) == (2, 1)
    assert win["error_rate_pct"] == 50.0
    assert win["avg_wall_ms"] == 3.0
    assert win["n_distinct_ops"] == 2


def test_top_errors_rollup(spark, collector):
    """top_errors mirrors telemetry.go:311-326,367: group by
    kind + 50-char message prefix, first-occurrence display message,
    last-occurrence timestamp/swamp, top-k by count."""
    from hydraide_spark.operators.telemetry import top_errors

    for i in range(3):
        with pytest.raises(Exception):
            spark.sql(f"SELECT assert_true(false, 'boom {i}')").collect()
    with pytest.raises(Exception):
        spark.sql("SELECT raise_error('other failure')").collect()
    _drain(collector, 4)
    collector.unregister()
    out = top_errors(collector.stats(), k=5).collect()
    assert len(out) >= 1
    by_count = {r["err_msg"]: r["n_errors"] for r in out}
    # the three assert_true failures differ within the first 50 chars
    # ('boom 0/1/2'), so they are distinct error groups of count 1 each
    assert sum(1 for m in by_count if "boom" in m) == 3
    assert all(r["last_ts_us"] > 0 for r in out)
    assert out == sorted(
        out, key=lambda r: (-r["n_errors"], r["err_kind"], r["err_msg"])
    )


def test_top_errors_groups_by_truncated_key(spark):
    """Messages identical in their first 50 chars group together; the
    display message is the FIRST occurrence's 100-char prefix and
    last_scanned tracks the LAST occurrence (reference semantics)."""
    from hydraide_spark.operators.telemetry import top_errors

    c = QueryStatsCollector(spark)
    c.unregister()  # drive the buffer directly
    base = 10_000_000_000_000
    long_a = "X" * 50 + " tail one ........................................"
    long_b = "X" * 50 + " tail two (same 50-char key, different display)"
    c._append((base + 1, "q", 0.0, False, ["t1"], "SparkException", long_a))
    c._append((base + 2, "q", 0.0, False, ["t2"], "SparkException", long_b))
    c._append((base + 3, "q", 0.0, False, ["t3"], "AnalysisException", "nope"))
    rows = top_errors(c.stats(), k=5).collect()
    assert len(rows) == 2
    top = rows[0]
    assert top["err_kind"] == "SparkException" and top["n_errors"] == 2
    assert top["err_msg"] == long_a[:100]      # first occurrence, 100-cap
    assert top["last_ts_us"] == base + 2       # last occurrence
    assert top["last_scanned"] == "t2"
    assert rows[1]["err_kind"] == "AnalysisException"


def test_unregister_stops_recording(spark):
    c = QueryStatsCollector(spark)
    spark.range(10).count()
    _drain(c, 1)
    c.unregister()
    time.sleep(2.0)  # let in-flight listener events (incl. the drain's
    c.clear()        # own collects) land before clearing
    spark.range(10).count()
    time.sleep(2.0)
    assert len(c.stats().collect()) == 0


def test_buffer_is_bounded_by_window_and_cap(spark):
    """The reference keeps a rolling 30-min telemetry window
    (proto:568-576): rows past the window evict, and max_rows hard-caps
    bursts — a long-lived driver can never leak."""
    c = QueryStatsCollector(spark, window_sec=60, max_rows=50)
    c.unregister()  # exercise the buffer directly, no listener noise
    base = 10_000_000_000_000  # arbitrary epoch µs
    for i in range(200):
        c._append((base + i * 1_000_000, "op", 1.0, True, [], None, None))
    with c._mu:
        rows = list(c._rows)
    assert len(rows) <= 50  # hard cap
    newest = rows[-1][0]
    assert all(r[0] >= newest - 60 * 1_000_000 for r in rows)  # window
    # sparse traffic: only the window evicts, cap untouched
    c.clear()
    for i in range(10):
        c._append((base + i * 120 * 1_000_000, "op", 1.0, True, [], None, None))
    with c._mu:
        rows = list(c._rows)
    assert len(rows) == 1  # each row 2 min apart, 1-min window


def test_flush_persists_and_rollups_match_buffer(spark, tmp_path):
    """Buffer-rollups must equal table-rollups after a flush: the 4
    RPC surfaces are the same queries over either frame."""
    from hydraide_spark.sources.tables import load_table

    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    try:
        sf = "/root/testdata/sf0.001"
        for _ in range(3):
            load_table(spark, sf, "nation").count()
        load_table(spark, sf, "region").count()
        _drain(c, 4)
        c.unregister()  # freeze the buffer so both sides see the same rows
        buffered = c.stats()
        n_buffered = len(buffered.collect())
        buf_rollups = {
            "rates": rolling_rates(buffered, window_sec=3600).collect(),
            "tops": top_swamps(buffered, k=5).collect(),
            "slow": slow_queries(buffered, k=5).collect(),
            "hist": history(buffered, window_sec=3600).collect(),
        }
        assert c.flush() == n_buffered
        assert len(c.stats().collect()) == 0  # buffer cleared by flush
        persisted = c.persisted_stats()
        assert persisted.schema == buffered.schema
        got = {
            "rates": rolling_rates(persisted, window_sec=3600).collect(),
            "tops": top_swamps(persisted, k=5).collect(),
            "slow": slow_queries(persisted, k=5).collect(),
            "hist": history(persisted, window_sec=3600).collect(),
        }
        assert got == buf_rollups
        # a second flush appends a new batch; the union view sees both
        c._append((time.time_ns() // 1_000, "extra", 1.0, True, [], None, None))
        assert c.flush() == 1
        assert len(c.persisted_stats().collect()) == n_buffered + 1
    finally:
        c.unregister()


def test_error_details_drilldown(spark):
    """GetErrorDetails analogue (proto:586): kind/prefix/time filters
    over the raw error rows, newest first, full (untruncated) message."""
    from hydraide_spark.operators.telemetry import error_details

    c = QueryStatsCollector(spark)
    c.unregister()
    base = 10_000_000_000_000
    c._append((base + 1, "q1", 0.0, False, ["ta"], "SparkException", "disk full"))
    c._append((base + 2, "q2", 1.0, True, ["tb"], None, None))
    c._append((base + 3, "q3", 0.0, False, ["tc"], "SparkException", "disk quota"))
    c._append((base + 4, "q4", 0.0, False, ["td"], "AnalysisException", "bad col"))
    rows = error_details(c.stats(), err_kind="SparkException").collect()
    assert [r["op"] for r in rows] == ["q3", "q1"]  # newest first, no oks
    rows = error_details(c.stats(), msg_prefix="disk f").collect()
    assert [r["err_msg"] for r in rows] == ["disk full"]
    rows = error_details(c.stats(), since_us=base + 3).collect()
    assert {r["err_kind"] for r in rows} == {"SparkException", "AnalysisException"}


def test_streaming_rolling_rates_over_flushed_batches(spark, tmp_path):
    """SubscribeToTelemetry analogue (proto:566): flushed batch dirs
    arrive through readStream; the windowed call/error rollup runs as a
    structured stream and sees batches flushed BEFORE and AFTER the
    stream starts."""
    from hydraide_spark.operators.telemetry import streaming_rolling_rates

    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    c.unregister()
    base = 1_700_000_000_000_000  # stable epoch µs
    c._append((base + 1_000_000, "op-a", 1.0, True, [], None, None))
    c._append((base + 2_000_000, "op-b", 0.0, False, [], "SparkException", "x"))
    assert c.flush() == 2
    rates = streaming_rolling_rates(c.stats_stream(), window_duration="1 minute")
    q = (
        rates.writeStream.format("memory")
        .queryName("telemetry_rates_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # a second batch lands while the stream is live
        c._append((base + 30_000_000, "op-c", 2.0, False, [], "Boom", "y"))
        assert c.flush() == 1
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT n_calls, n_errors, error_rate FROM telemetry_rates_out"
        ).collect()
    finally:
        q.stop()
    # update mode re-emits the window as it grows: latest row wins
    assert any(r["n_calls"] == 3 and r["n_errors"] == 2 for r in rows)
    assert all(0.0 <= r["error_rate"] <= 1.0 for r in rows)


def test_streaming_top_errors_complete_mode(spark, tmp_path):
    """The top-errors ranking as a live stream: counts accumulate
    across flushed batches and the complete-mode output re-ranks."""
    from hydraide_spark.operators.telemetry import streaming_top_errors

    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    c.unregister()
    base = 1_700_000_000_000_000
    c._append((base + 1, "q", 0.0, False, [], "Boom", "a"))
    c._append((base + 2, "q", 0.0, False, [], "Boom", "a"))
    c._append((base + 3, "q", 0.0, False, [], "Crash", "b"))
    assert c.flush() == 3
    ranked = streaming_top_errors(c.stats_stream(), k=5)
    q = (
        ranked.writeStream.format("memory")
        .queryName("top_errs_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        # a later batch flips the ranking
        for i in range(3):
            c._append((base + 10 + i, "q", 0.0, False, [], "Crash", "b"))
        assert c.flush() == 3
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT err_kind, n_errors FROM top_errs_out ORDER BY n_errors DESC"
        ).collect()
    finally:
        q.stop()
    assert [(r["err_kind"], r["n_errors"]) for r in rows] == [("Crash", 4), ("Boom", 2)]


def test_stats_stream_errors_only_flag(spark, tmp_path):
    """ErrorsOnly subscription (telemetry.go:54): the stream surfaces
    only failed-query rows."""
    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    c.unregister()
    base = 1_700_000_000_000_000
    c._append((base + 1, "ok-op", 1.0, True, [], None, None))
    c._append((base + 2, "bad-op", 0.0, False, [], "Boom", "x"))
    assert c.flush() == 2
    q = (
        c.stats_stream(errors_only=True)
        .writeStream.format("memory")
        .queryName("errs_only_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT op, err_kind FROM errs_only_out").collect()
    finally:
        q.stop()
    assert [(r["op"], r["err_kind"]) for r in rows] == [("bad-op", "Boom")]


def test_prune_drops_expired_batches(spark, tmp_path):
    c = QueryStatsCollector(
        spark, window_sec=60, table_path=str(tmp_path / "stats")
    )
    c.unregister()
    now = time.time_ns() // 1_000
    old = now - 3600 * 1_000_000
    c._append((old, "old-op", 1.0, True, [], None, None))
    assert c.flush() == 1
    c._append((now, "new-op", 1.0, True, [], None, None))
    assert c.flush() == 1
    assert len(c.persisted_stats().collect()) == 2
    assert c.prune(now_us=now) == 1  # the hour-old batch expires
    rows = c.persisted_stats().collect()
    assert [r["op"] for r in rows] == ["new-op"]


def test_flush_loop_persists_periodically(spark, tmp_path):
    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    c.unregister()
    now = time.time_ns() // 1_000
    c._append((now, "op-a", 1.0, True, [], None, None))
    stop = c.start_flush_loop(interval_sec=0.2)
    try:
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline:
            try:
                if len(c.persisted_stats().collect()) >= 1:
                    break
            except Exception:
                pass  # table not created yet
            time.sleep(0.1)
        assert len(c.persisted_stats().collect()) == 1
        with c._mu:
            assert len(c._rows) == 0  # flushed out of the buffer
    finally:
        stop.set()
