"""Swamp-pattern registry (reference RegisterSwamp/DeRegisterSwamp,
proto:43-49,803-856; settings.go:156-275): pattern matching,
most-specific resolution, JSON round-trip, and consumption by
TreasureStore (partition layout, in-memory lifecycle) and streaming
(write-interval trigger)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hydraide_spark.sources.registry import (
    SwampRegistry,
    SwampSettings,
    default_settings,
)
from hydraide_spark.sources.store import TreasureStore
from hydraide_spark.streaming.subscribe import trigger_for


def test_pattern_validation():
    with pytest.raises(ValueError):
        SwampSettings("only/two")
    with pytest.raises(ValueError):
        SwampSettings("*/realm/swamp")  # sanctuary never wildcards (name.go:162-165)
    with pytest.raises(ValueError):
        SwampSettings("a//c")
    SwampSettings("a/*/*")  # realm+swamp wildcards are fine


def test_matching_semantics():
    """ComparePattern (name.go:162-173): sanctuary exact, realm/swamp
    exact-or-*."""
    s = SwampSettings("users/catalog/*")
    assert s.matches("users/catalog/books")
    assert s.matches("users/catalog/games")
    assert not s.matches("users/other/books")
    assert not s.matches("admin/catalog/books")
    assert SwampSettings("users/*/*").matches("users/x/y")


def test_resolution_most_specific_wins_deterministically():
    reg = SwampRegistry()
    reg.register(SwampSettings("s/*/*", close_after_idle_sec=1))
    reg.register(SwampSettings("s/r/*", close_after_idle_sec=2))
    reg.register(SwampSettings("s/*/w", close_after_idle_sec=3))
    reg.register(SwampSettings("s/r/w", close_after_idle_sec=4))
    assert reg.resolve("s/r/w").close_after_idle_sec == 4  # exact
    # one wildcard each: exact swamp segment beats exact realm segment
    assert reg.resolve("s/q/w").close_after_idle_sec == 3
    assert reg.resolve("s/r/x").close_after_idle_sec == 2
    assert reg.resolve("s/a/b").close_after_idle_sec == 1
    # unregistered -> reference defaults (settings.go:265-273)
    d = reg.resolve("t/a/b")
    assert d == default_settings("t/a/b")
    assert d.close_after_idle_sec == 5 and d.write_interval_sec == 1
    assert not d.in_memory


def test_register_roundtrip_and_unchanged_shortcircuit(tmp_path):
    root = str(tmp_path / "reg")
    reg = SwampRegistry(root)
    s = SwampSettings(
        "tpch/orders/*",
        in_memory=True,
        close_after_idle_sec=30,
        write_interval_sec=7,
        partition_by=("swamp",),
    )
    assert reg.register(s) is True
    # identical re-registration: no-op, no rewrite (settings.go:173-182)
    mtime = os.path.getmtime(os.path.join(root, SwampRegistry.FILE))
    assert reg.register(s) is False
    assert os.path.getmtime(os.path.join(root, SwampRegistry.FILE)) == mtime
    # a fresh registry instance resumes the persisted configuration
    reg2 = SwampRegistry(root)
    assert reg2.patterns() == [s]
    assert reg2.resolve("tpch/orders/O") == s
    # deregister removes configuration only
    assert reg2.deregister("tpch/orders/*") is True
    assert reg2.deregister("tpch/orders/*") is False
    assert SwampRegistry(root).patterns() == []


def test_store_consumes_registry_layout_and_memory_lifecycle(spark, tmp_path):
    reg = SwampRegistry()
    reg.register(
        SwampSettings(
            "app/events/*",
            in_memory=True,
            close_after_idle_sec=60,
            write_interval_sec=9,
            partition_by=("realm",),
        )
    )
    store = TreasureStore(
        spark,
        str(tmp_path / "store"),
        name="app/events/clicks",
        registry=reg,
    )
    assert store.settings is not None and store.settings.write_interval_sec == 9
    assert store.partition_by == ["realm"]
    df = spark.range(10).select(
        F.col("id").cast("string").alias("key"),
        (F.col("id") % 2).cast("string").alias("realm"),
        F.col("id").alias("v"),
    )
    store.init(df)
    # partition layout reached the snapshot directory
    v0 = os.path.join(store.root, "v=0")
    assert any(d.startswith("realm=") for d in os.listdir(v0))
    # in_memory: snapshot is pinned; same version reuses the pin
    cur = store.current()
    assert cur.is_cached
    assert store.current() is cur
    assert cur.count() == 10
    # not yet idle -> pin survives; past the TTL -> released
    assert store.close_if_idle(now=store._last_access + 1) is False
    assert cur.is_cached
    assert store.close_if_idle(now=store._last_access + 61) is True
    assert not cur.is_cached
    # destroy removes data; registry configuration is independent
    store.destroy()
    assert reg.resolve("app/events/clicks").write_interval_sec == 9


def test_trigger_for_uses_registered_write_interval(spark, tmp_path):
    reg = SwampRegistry()
    reg.register(SwampSettings("a/b/*", write_interval_sec=42))
    configured = TreasureStore(
        spark, str(tmp_path / "s1"), name="a/b/c", registry=reg
    )
    plain = TreasureStore(spark, str(tmp_path / "s2"))
    assert trigger_for(configured) == {"processingTime": "42 seconds"}
    assert trigger_for(plain) == {"processingTime": "1 seconds"}


def test_settings_reject_nonsense_intervals():
    with pytest.raises(ValueError):
        SwampSettings("a/b/c", close_after_idle_sec=-1)
    with pytest.raises(ValueError):
        SwampSettings("a/b/c", write_interval_sec=0)
