"""Store-layout advisor (r12 VERDICT #8): opt-in workload telemetry
(write batch sizes + external scans), the prune-factor recommendation
formula, and the migration call it names.

Pins:
- the pure formula: point-write-heavy -> bucketed (n_buckets sized by
  the 4096-rows-per-bucket rule), scan-heavy -> flat,
- workload recording: batch sizes from keyed mutations, scans counted
  only OUTSIDE transactions (mutations' internal base reads are write
  cost, not scans),
- advise_layout end-to-end on a live store for both history shapes,
- migrate_layout: flat -> bucketed -> flat round trip preserves state
  and events, the _LAYOUT marker tracks, and reopening adopts it.
"""

from __future__ import annotations

import os

from hydraide_spark.sources.layout_advisor import (
    auto_store_buckets,
    recommend_layout,
)
from hydraide_spark.sources.store import TreasureStore

SCHEMA = "key string, val long, expired_at timestamp"


def test_recommendation_formula_regimes():
    # point-write-heavy: 1,000 batches of 100 keys on a 3M-row store
    # -> prune factor 100/1024 ~ 0.1, scans negligible -> bucketed
    rec = recommend_layout([100] * 1000, n_scans=2, n_rows=3_000_000)
    assert rec["recommendation"] == "bucketed"
    assert rec["n_buckets"] == auto_store_buckets(3_000_000) == 1024
    assert rec["mean_prune_factor"] < 0.15
    assert "migrate_layout(n_buckets=1024)" in rec["migration"]

    # scan-heavy: every scan pays the ~7x-per-1024-buckets listing
    # overhead and the few bulk writes prune nothing -> flat
    rec2 = recommend_layout([300_000] * 5, n_scans=500, n_rows=3_000_000)
    assert rec2["recommendation"] == "flat"
    assert rec2["n_buckets"] is None
    assert "migrate_layout(n_buckets=None)" in rec2["migration"]

    # empty history: no evidence -> flat (cost tie at zero ops)
    assert recommend_layout([], 0, 1000)["recommendation"] == "flat"


def _mk(spark, path, n=200, **kw):
    store = TreasureStore(spark, str(path), **kw)
    store.init(
        spark.createDataFrame([(f"k{i}", i, None) for i in range(n)], SCHEMA)
    )
    return store


def test_workload_recording_and_advise(spark, tmp_path):
    store = _mk(spark, tmp_path / "s", track_workload=True)
    store.set(spark.createDataFrame([("k1", 10, None), ("k2", 2, None)], SCHEMA))
    store.delete(["k3", "k4", "k5"])
    store.increment(["k6"], "val", 1)
    store.current().count()
    store.current().count()
    assert store.workload["write_batches"] == [2, 3, 1]
    # only the two external reads count — each mutation's internal base
    # read runs inside the transaction
    assert store.workload["scans"] == 2

    rec = store.advise_layout()
    assert rec["current_layout"] == "flat"
    assert rec["n_writes"] == 3 and rec["n_scans"] >= 2

    # a point-write-heavy synthetic history on a big store: bucketed
    store.workload["write_batches"] = [50] * 500
    store.workload["scans"] = 1
    rec_w = store.advise_layout()
    # n_rows is tiny here, so recompute with the real formula at size
    rec_big = recommend_layout([50] * 500, 1, 3_000_000)
    assert rec_big["recommendation"] == "bucketed"

    # a scan-heavy history: flat (and the store IS flat -> optimal)
    store.workload["write_batches"] = [100_000] * 3
    store.workload["scans"] = 300
    rec_s = store.advise_layout()
    assert rec_s["recommendation"] == "flat"
    assert rec_s["already_optimal"] is True


def _state(store):
    return sorted(
        (r["key"], r["val"])
        for r in store.current().select("key", "val").collect()
    )


def test_migrate_layout_round_trip(spark, tmp_path):
    store = _mk(spark, tmp_path / "m", n=300)
    store.set(spark.createDataFrame([("k5", 555, None), ("zz", 1, None)], SCHEMA))
    store.delete(["k7"])
    before = _state(store)
    ev_before = sorted(
        (r["batch_id"], r["op"], r["key"]) for r in store.changes().collect()
    )

    assert store.migrate_layout(n_buckets=16) is True
    assert store.n_buckets == 16
    assert _state(store) == before
    # the new version is really bucketed (manifest + bucket dirs)
    mapping, flat = store._manifest_layout(store.version)
    assert mapping and flat is None
    # point write still works and prunes
    store.set(spark.createDataFrame([("k5", -5, None)], SCHEMA))
    assert ("k5", -5) in _state(store)

    # reopening adopts the migrated layout
    reopened = TreasureStore(spark, str(tmp_path / "m"))
    assert reopened.n_buckets == 16
    assert _state(reopened) == sorted(
        set(before) - {("k5", 555)} | {("k5", -5)}
    )

    # back to flat
    assert reopened.migrate_layout(n_buckets=None) is True
    assert reopened.n_buckets is None
    assert not os.path.exists(reopened._manifest_path(reopened.version))
    assert _state(reopened) == sorted(set(before) - {("k5", 555)} | {("k5", -5)})
    # events survive migrations untouched (history lives in the log)
    ev_after = sorted(
        (r["batch_id"], r["op"], r["key"]) for r in reopened.changes().collect()
    )
    assert [e for e in ev_after if e[0] <= max(b for b, _, _ in ev_before)] == ev_before

    # no-op when already in the requested layout
    assert reopened.migrate_layout(n_buckets=None) is False

    reopened2 = TreasureStore(spark, str(tmp_path / "m"))
    assert reopened2.n_buckets is None


# --- unified-state table advisor (r13) ---------------------------------------


def test_state_layout_probe_heavy_recommends_bucketing(tmp_path):
    """A serving-style history (thousands of few-word probes, no full
    scans) on a big corpus must recommend the word-bucketed base, with
    the concrete compaction call."""
    import json
    import os

    from hydraide_spark.streaming.search_stream import (
        _record_workload,
        advise_state_layout,
    )

    state = str(tmp_path / "ustate")
    os.makedirs(state)
    # stats catalog: marker payload path — write the _STATS base directly
    with open(os.path.join(state, "_STATS"), "w") as fh:
        json.dump({"base_rows": 1_000_000, "dim": 8, "absorbed": []}, fh)
    for _ in range(200):
        _record_workload(state, "postings", "probe", 3)
    rec = advise_state_layout(state, "postings")
    assert rec["recommendation"] == "bucketed"
    assert rec["n_buckets"] and rec["n_buckets"] >= 16
    assert "compact_hashed_epochs" in rec["migration"]
    assert "'word'" in rec["migration"]


def test_state_layout_scan_heavy_recommends_flat(tmp_path):
    import json
    import os

    from hydraide_spark.streaming.search_stream import (
        _record_workload,
        advise_state_layout,
    )

    state = str(tmp_path / "ustate")
    os.makedirs(state)
    with open(os.path.join(state, "_STATS"), "w") as fh:
        json.dump({"base_rows": 1_000_000, "dim": 8, "absorbed": []}, fh)
    for _ in range(50):
        _record_workload(state, "postings", "scan")
    _record_workload(state, "postings", "probe", 3)
    rec = advise_state_layout(state, "postings")
    assert rec["recommendation"] == "flat"
    assert rec["n_buckets"] is None
    assert "compact_epochs" in rec["migration"]


def test_state_layout_history_is_bounded_and_serving_records(spark, tmp_path):
    """persisted_postings records its own access kind via the append
    log (r14); the aggregated probe-keys history stays bounded at 1000
    entries while the probe COUNT keeps every event."""
    from hydraide_spark.streaming.search_stream import (
        _record_workload,
        _workload_history,
        make_postings_ingest,
        persisted_postings,
    )

    state = str(tmp_path / "ustate")
    ingest = make_postings_ingest(spark, state)
    ingest(
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "beta delta")],
            "doc_id long, text string",
        ),
        0,
    )
    persisted_postings(spark, state, words=["beta", "alpha"]).count()
    persisted_postings(spark, state).count()
    wl = _workload_history(state, "postings")
    assert wl["probes"] == 1 and wl["scans"] == 1
    assert wl["probe_keys"] == [2]
    for _ in range(1100):
        _record_workload(state, "postings", "probe", 1)
    wl = _workload_history(state, "postings")
    assert len(wl["probe_keys"]) == 1000  # bounded history
    assert wl["probes"] == 1101


def test_state_layout_concurrent_recorders_lose_nothing(tmp_path):
    """r14 ADVICE: the r13 read-modify-replace lost concurrent updates
    last-writer-wins on the whole file; O_APPEND event lines make
    every recorder's events land. 8 threads × 100 events each must all
    be visible to the aggregator."""
    import os
    import threading

    from hydraide_spark.streaming.search_stream import (
        _record_workload,
        _workload_history,
    )

    state = str(tmp_path / "ustate")
    os.makedirs(state)

    def hammer(i):
        for _ in range(100):
            _record_workload(state, "postings", "probe", i + 1)

    threads = [threading.Thread(target=hammer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wl = _workload_history(state, "postings")
    assert wl["probes"] == 800  # zero lost updates
    assert len(wl["probe_keys"]) == 800


def test_state_layout_legacy_snapshot_still_counts(tmp_path):
    """A pre-r14 _WORKLOAD.json snapshot merges with new append-log
    events — upgrading never forgets recorded history."""
    import json
    import os

    from hydraide_spark.streaming.search_stream import (
        _WORKLOAD_FILE,
        _record_workload,
        _workload_history,
    )

    state = str(tmp_path / "ustate")
    os.makedirs(state)
    with open(os.path.join(state, _WORKLOAD_FILE), "w") as fh:
        json.dump(
            {"postings": {"probes": 5, "probe_keys": [1, 2, 3, 4, 5], "scans": 2}},
            fh,
        )
    _record_workload(state, "postings", "probe", 7)
    _record_workload(state, "postings", "scan")
    wl = _workload_history(state, "postings")
    assert wl["probes"] == 6 and wl["scans"] == 3
    assert wl["probe_keys"] == [1, 2, 3, 4, 5, 7]


def test_state_layout_cell_partitioned_tables_never_hash_bucket(tmp_path):
    """cells/codes/pqcodes get their probe pruning from the cell=
    layout — the advisor must preserve it (hash-bucketing would
    destroy partition pruning), whatever the access history says."""
    import json
    import os

    from hydraide_spark.streaming.search_stream import (
        _record_workload,
        advise_state_layout,
    )

    state = str(tmp_path / "ustate")
    os.makedirs(state)
    with open(os.path.join(state, "_STATS"), "w") as fh:
        json.dump({"base_rows": 1_000_000, "dim": 8, "absorbed": []}, fh)
    for _ in range(200):
        _record_workload(state, "cells", "probe", 2)
    rec = advise_state_layout(state, "cells")
    assert rec["recommendation"] == "cell-partitioned"
    assert "partition_by=['cell']" in rec["migration"]
    assert rec["n_buckets"] is None
