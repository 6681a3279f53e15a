"""Crash-safety tests for the two non-atomic-swap findings of the
round-8 ADVICE: streaming state compaction (state_compact.py) and the
store's chronicle prune (store.py). Each test reconstructs a specific
crash window by hand-arranging the on-disk state the interrupted
process would have left, then asserts the next entry self-recovers —
no data lost, no unparseable partition dirs, no duplicated rows.

Also covers the pre-r8 legacy flat near-dup state layout (null-epoch
rows must survive the own-epoch probe exclusion) and the empty-patches
short-circuit in patch_each.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from hydraide_spark.sources.store import TreasureStore
from hydraide_spark.streaming.state_compact import (
    BASE_EPOCH,
    compact_epochs,
)


def _write_epochs(spark, table, n_epochs, rows_per_epoch=2):
    for e in range(n_epochs):
        spark.createDataFrame(
            [(e * 100 + i, f"v{e}-{i}") for i in range(rows_per_epoch)],
            "id long, v string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(table, f"epoch={e}")
        )


def _all_rows(spark, table):
    return sorted(
        (r["id"], r["v"])
        for r in spark.read.option("basePath", table)
        .parquet(table)
        .select("id", "v")
        .collect()
    )


def test_compact_epochs_normal_run_leaves_clean_dirs(spark, tmp_path):
    table = str(tmp_path / "t")
    _write_epochs(spark, table, 3)
    before = _all_rows(spark, table)
    assert compact_epochs(spark, table) == 2
    assert _all_rows(spark, table) == before
    names = sorted(os.listdir(table))
    assert names == [f"epoch={BASE_EPOCH}", "epoch=2"]
    # no manifest left inside the base
    assert not os.path.exists(
        os.path.join(table, f"epoch={BASE_EPOCH}", "_FOLDED")
    )


def test_compact_recovers_crash_between_move_aside_and_promote(spark, tmp_path):
    """The exact ADVICE window: base moved aside, tmp complete, promote
    never ran. Entry must finish the swap — rows intact, fold dirs
    gone, no stray dirs."""
    table = str(tmp_path / "t")
    _write_epochs(spark, table, 3)
    before = _all_rows(spark, table)
    assert compact_epochs(spark, table) == 2  # build a real base first
    _write_epochs(spark, table, 2)  # epochs 0,1 again (new data)
    before = _all_rows(spark, table)

    # simulate: a compaction of epochs {-1, 0} wrote tmp completely,
    # moved the base aside, then died before promoting
    fold = [BASE_EPOCH, 0]
    src = spark.read.option("basePath", table).parquet(
        *[os.path.join(table, f"epoch={e}") for e in fold]
    ).drop("epoch")
    tmp = os.path.join(table, "_compacting")
    src.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_FOLDED"), "w") as fh:
        fh.write("\n".join(str(e) for e in fold))
    os.rename(os.path.join(table, f"epoch={BASE_EPOCH}"), os.path.join(table, "_old_base"))

    # next compaction self-recovers on entry, then folds what remains
    compact_epochs(spark, table)
    assert _all_rows(spark, table) == before
    names = sorted(os.listdir(table))
    assert all(n.startswith("epoch=") for n in names), names
    # every remaining partition value parses (the .old bug is gone)
    for n in names:
        int(n.split("=", 1)[1])


def test_compact_rolls_back_incomplete_tmp(spark, tmp_path):
    """Crash mid-write: tmp exists without _FOLDED (or _SUCCESS), base
    already moved aside. Entry must restore the old base and discard
    the partial tmp — never promote a half-written rewrite."""
    table = str(tmp_path / "t")
    _write_epochs(spark, table, 2)
    assert compact_epochs(spark, table) == 1
    before = _all_rows(spark, table)

    base = os.path.join(table, f"epoch={BASE_EPOCH}")
    tmp = os.path.join(table, "_compacting")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"partial garbage")
    os.rename(base, os.path.join(table, "_old_base"))

    compact_epochs(spark, table)
    assert _all_rows(spark, table) == before
    assert not os.path.exists(tmp)
    assert not os.path.exists(os.path.join(table, "_old_base"))


def test_compact_replays_interrupted_cleanup_without_duplication(spark, tmp_path):
    """Crash after promote but before fold-dir deletion: the folded
    rows exist in BOTH the new base and the old epoch dirs. The
    manifest inside the base must drive the cleanup replay — without
    it the next compaction would fold those rows twice."""
    table = str(tmp_path / "t")
    _write_epochs(spark, table, 3)
    before = _all_rows(spark, table)

    # run the fold but re-create the crash state: put the fold dirs
    # back and restore the manifest, as if cleanup never ran
    src = spark.read.option("basePath", table).parquet(
        os.path.join(table, "epoch=0"), os.path.join(table, "epoch=1")
    ).drop("epoch")
    base = os.path.join(table, f"epoch={BASE_EPOCH}")
    src.coalesce(1).write.mode("overwrite").parquet(base)
    with open(os.path.join(base, "_FOLDED"), "w") as fh:
        fh.write("0\n1")

    compact_epochs(spark, table)
    assert _all_rows(spark, table) == before  # duplicated? this fails
    names = sorted(os.listdir(table))
    assert f"epoch={BASE_EPOCH}" in names and "epoch=2" in names
    assert "epoch=0" not in names and "epoch=1" not in names


def test_compact_recovers_legacy_dot_old_dir(spark, tmp_path):
    """A pre-fix crash left 'epoch=-1.old' (unparseable partition
    value) and no base: entry restores it instead of raising at
    int('-1.old')."""
    table = str(tmp_path / "t")
    _write_epochs(spark, table, 2)
    assert compact_epochs(spark, table) == 1
    base = os.path.join(table, f"epoch={BASE_EPOCH}")
    before = _all_rows(spark, table)
    os.rename(base, base + ".old")

    assert compact_epochs(spark, table) in (0, 1)
    assert _all_rows(spark, table) == before
    assert not os.path.exists(base + ".old")


def test_prune_changes_recovers_from_lost_live_dir(spark, tmp_path):
    """The ADVICE store window: crash between moving changes/ aside and
    promoting the compacted rewrite. Re-opening the store must restore
    the log (from .old, or from a complete .compacting) — history must
    NOT silently restart from empty."""
    store = TreasureStore(spark, str(tmp_path / "s"))
    store.init(spark.createDataFrame([("a", 1)], "key string, val long"))
    store.set(spark.createDataFrame([("a", 2)], "key string, val long"))
    store.set(spark.createDataFrame([("b", 3)], "key string, val long"))
    n_events = store.changes().count()
    assert n_events == 2

    # crash window A: live dir moved aside, no replacement yet
    os.rename(store.changes_dir, store.changes_dir + ".old")
    reopened = TreasureStore(spark, str(tmp_path / "s"))
    assert reopened.changes().count() == n_events
    assert not os.path.exists(store.changes_dir + ".old")

    # crash window B: complete .compacting written, live dir moved
    # aside — recovery must promote the REWRITE (it is the newer state)
    keep = reopened.changes().filter(F.col("batch_id") >= 2)
    keep.coalesce(1).write.parquet(store.changes_dir + ".compacting")
    shutil.rmtree(store.changes_dir)
    reopened2 = TreasureStore(spark, str(tmp_path / "s"))
    rows = reopened2.changes().collect()
    assert {r["batch_id"] for r in rows} == {2}
    assert not os.path.exists(store.changes_dir + ".compacting")

    # appends keep working on the recovered log
    reopened2.set(spark.createDataFrame([("c", 4)], "key string, val long"))
    assert reopened2.changes().count() == 2


def test_prune_changes_discards_incomplete_compacting(spark, tmp_path):
    """An incomplete .compacting (no _SUCCESS) next to a live log is
    stale garbage from an aborted prune — removed on entry, log kept."""
    store = TreasureStore(spark, str(tmp_path / "s"))
    store.init(spark.createDataFrame([("a", 1)], "key string, val long"))
    store.set(spark.createDataFrame([("a", 2)], "key string, val long"))
    tmp = store.changes_dir + ".compacting"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as fh:
        fh.write(b"junk")
    assert store.prune_changes(0) == 0  # entry recovery ran; no-op prune
    assert not os.path.exists(tmp)
    assert store.changes().count() == 1


def test_patch_each_empty_patches_is_a_noop(spark, tmp_path):
    """proto allows an empty Patches list: no new version, no events,
    an empty (patch_index, key, patch_status) frame — not IndexError."""
    store = TreasureStore(spark, str(tmp_path / "s"))
    store.init(spark.createDataFrame([("a", 1)], "key string, val long"))
    v_before = store.version
    ev_before = store.changes().count()
    out = store.patch_each([])
    assert out.columns == ["patch_index", "key", "patch_status"]
    assert out.count() == 0
    assert store.version == v_before
    assert store.changes().count() == ev_before


def test_streaming_neardup_legacy_flat_state_still_pairs(spark, tmp_path):
    """Pre-r8 state dirs were flat (append mode, no epoch= partition):
    read through the '+ epoch long' schema those rows are epoch=NULL,
    and a bare `epoch != current` silently dropped the whole legacy
    index. coalesce(epoch, -1) must keep them pairable."""
    from hydraide_spark.streaming import ingested_pairs
    from hydraide_spark.streaming.dedup_stream import make_ingest

    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again"
    state = str(tmp_path / "nd")
    ingest = make_ingest(spark, state, tau=0.6)

    # build state the modern way, then FLATTEN it to the legacy layout:
    # move epoch=0's files up into the table root
    ingest(spark.createDataFrame([(1, base)], schema), 0)
    for t in ("bands", "shingles"):
        tdir = os.path.join(state, t)
        edir = os.path.join(tdir, "epoch=0")
        for name in os.listdir(edir):
            os.rename(os.path.join(edir, name), os.path.join(tdir, name))
        os.rmdir(edir)

    # a new epoch ingests a near-duplicate of the LEGACY doc: the pair
    # (1, 2) can only come from the flattened (epoch=NULL) index
    ingest(spark.createDataFrame([(2, base + " ok")], schema), 1)
    pairs = {
        (r["id_a"], r["id_b"]) for r in ingested_pairs(spark, state).collect()
    }
    assert (1, 2) in pairs

    # the MIXED layout (flat legacy files + epoch=1 subdir) must also
    # read: a further epoch pairs against both generations
    ingest(spark.createDataFrame([(3, base)], schema), 2)
    pairs = {
        (r["id_a"], r["id_b"]) for r in ingested_pairs(spark, state).collect()
    }
    assert (1, 3) in pairs and (2, 3) in pairs


def test_readers_exclude_pending_folded_epochs(spark, tmp_path):
    """r9-ADVICE crash window: promote landed (base holds the folded
    rows + the _FOLDED manifest) but cleanup did not — the folded
    epoch dirs AND their commit markers still exist. Readers never run
    _recover; they must self-heal read-only by excluding the
    manifest-listed epochs from their view, else every folded row is
    counted twice (inflated BM25 tf/dfreq, duplicate ANN candidates)."""
    from hydraide_spark.streaming.search_stream import (
        committed_epochs,
        persisted_doclen,
    )
    from hydraide_spark.streaming.state_compact import pending_folded

    state = str(tmp_path / "s")
    dl_dir = os.path.join(state, "doclen")
    commits = os.path.join(state, "_commits")
    os.makedirs(commits)
    for e in range(3):
        spark.createDataFrame(
            [(e * 10 + i, 5) for i in range(2)], "doc_id long, dl int"
        ).coalesce(1).write.parquet(os.path.join(dl_dir, f"epoch={e}"))
        open(os.path.join(commits, f"epoch={e}"), "w").close()

    # hand-arrange the interrupted swap: base = folded epochs 0+1,
    # manifest still present, epoch dirs 0/1 NOT cleaned up
    base = os.path.join(dl_dir, f"epoch={BASE_EPOCH}")
    spark.read.option("basePath", dl_dir).parquet(
        os.path.join(dl_dir, "epoch=0"), os.path.join(dl_dir, "epoch=1")
    ).drop("epoch").coalesce(1).write.parquet(base)
    with open(os.path.join(base, "_FOLDED"), "w") as fh:
        fh.write("-1\n0\n1")

    assert pending_folded(dl_dir) == {0, 1}  # never the base itself

    # frontier read: each doc exactly once (base copy wins)
    eps = committed_epochs(state)
    ids = [
        r["doc_id"]
        for r in persisted_doclen(spark, state, epochs=eps).collect()
    ]
    assert sorted(ids) == sorted(set(ids)) == [0, 1, 10, 11, 20, 21]

    # read-everything (epochs=None) path must dedupe too
    ids = [r["doc_id"] for r in persisted_doclen(spark, state).collect()]
    assert sorted(ids) == [0, 1, 10, 11, 20, 21]

    # after a real compaction replays the cleanup, nothing is pending
    compact_epochs(spark, os.path.join(state, "doclen"))
    assert pending_folded(dl_dir) == set()
    ids = [
        r["doc_id"]
        for r in persisted_doclen(spark, state, epochs=committed_epochs(state)).collect()
    ]
    assert sorted(ids) == [0, 1, 10, 11, 20, 21]
