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
        c._append((base + i * 1_000_000, "op", 1.0, True, []))
    with c._mu:
        rows = list(c._rows)
    assert len(rows) <= 50  # hard cap
    newest = rows[-1][0]
    assert all(r[0] >= newest - 60 * 1_000_000 for r in rows)  # window
    # sparse traffic: only the window evicts, cap untouched
    c.clear()
    for i in range(10):
        c._append((base + i * 120 * 1_000_000, "op", 1.0, True, []))
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
        c._append((time.time_ns() // 1_000, "extra", 1.0, True, []))
        assert c.flush() == 1
        assert len(c.persisted_stats().collect()) == n_buffered + 1
    finally:
        c.unregister()


def test_prune_drops_expired_batches(spark, tmp_path):
    c = QueryStatsCollector(
        spark, window_sec=60, table_path=str(tmp_path / "stats")
    )
    c.unregister()
    now = time.time_ns() // 1_000
    old = now - 3600 * 1_000_000
    c._append((old, "old-op", 1.0, True, []))
    assert c.flush() == 1
    c._append((now, "new-op", 1.0, True, []))
    assert c.flush() == 1
    assert len(c.persisted_stats().collect()) == 2
    assert c.prune(now_us=now) == 1  # the hour-old batch expires
    rows = c.persisted_stats().collect()
    assert [r["op"] for r in rows] == ["new-op"]


def test_flush_loop_persists_periodically(spark, tmp_path):
    c = QueryStatsCollector(spark, table_path=str(tmp_path / "stats"))
    c.unregister()
    now = time.time_ns() // 1_000
    c._append((now, "op-a", 1.0, True, []))
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
