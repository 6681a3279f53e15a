"""Epoch compaction for streaming state tables — the maintenance op
the epoch-keyed-overwrite sink pattern (streaming/dedup_stream.py,
streaming/ann_stream.py) needs at scale: a long-running ingest leaves
one directory per micro-batch, and a million tiny epoch dirs is the
classic small-files problem (listing cost, open-per-file overhead,
tiny row groups).

``compact_epochs`` folds every COMMITTED epoch into a single reserved
base partition ``epoch=-1``:

- Only epochs strictly below the maximum epoch present are folded. The
  newest epoch may still be retried (its offset commit can land after
  the writes), and a retry overwrites its own ``epoch=N`` dir — if its
  rows had been folded into the base, the retry would duplicate them.
  Every OLDER epoch is committed by construction (a new epoch only
  starts after the previous one's commit), so folding them is safe.
- The base is itself ``epoch=-1``, so re-compaction folds base + old
  epochs into a new base; the reserved id never collides with a real
  epoch and is never excluded by the ingest's own-epoch probe filter
  (epochs are non-negative).
- The rewrite goes to a temp dir, then swaps directory-by-directory.
  Run it from the maintenance owner while the stream is stopped or
  between batches (single-writer, same contract as the reference's
  compactor running on swamp close — compactor.go).
- **Crash safety**: both the temp dir (``_compacting``) and the
  displaced old base (``_old_base``) are underscore-prefixed, so Spark
  partition discovery ignores them if a crash leaves them behind (a
  bare ``epoch=-1.old`` dir would mis-parse as a partition value).
  ``compact_epochs`` self-recovers on entry: a complete ``_compacting``
  (has ``_SUCCESS``) with no live base is swapped into place; an
  incomplete one is rolled back to ``_old_base``. The swap order is
  write-tmp → move-base-aside → promote-tmp, so at every instant either
  the base or a recoverable copy exists.

Readers (``ingested_pairs``, ``persisted_cells``, the ingest probes)
are unchanged: they read the root with partition discovery and treat
``epoch`` as opaque except for the ≠ current-epoch exclusion.

**Tiered (leveled) compaction — r10 VERDICT #2.** ``compact_epochs``
rewrites the ENTIRE base every fold; at 100 TB that is an O(full
index) write per maintenance tick. :func:`fold_to_l1` is the minor
fold: committed delta epochs (L0) fold into ONE new L1 *run*
directory — ``epoch=-2, -3, …`` (ids descend; a major fold deletes
them and the counter restarts) — WITHOUT touching the base or earlier
runs, so minor cost ∝ folded-delta size. :func:`compact_epochs_tiered`
runs a minor fold every call and triggers the full (major) fold only
when accumulated L1 bytes exceed ``l1_fraction`` of the base —
the classic leveled-LSM write-amplification bound (the reference's
write-buffer/compaction split, docs/features/v2-storage-engine.md).
Negative epoch ids are always-committed compaction artifacts: every
reader keeps them in every frontier (they are folds OF committed
epochs), the ingest's own-epoch exclusion never matches them (stream
epochs are non-negative), and L1 runs stay UNBUCKETED at the delta
dirs' directory depth — probes scan them like deltas, bounded by
``l1_fraction`` of the base.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

BASE_EPOCH = -1

_TMP_NAME = "_compacting"
_TMP_L1 = "_compacting_l1"
_OLD_NAME = "_old_base"
_MANIFEST = "_FOLDED"


def _is_complete(d: str) -> bool:
    """The tmp rewrite is complete iff the fold manifest landed — it is
    written AFTER Spark's own ``_SUCCESS``, so its presence implies the
    parquet commit finished too."""
    return os.path.isfile(os.path.join(d, _MANIFEST))


def _finish_swap(table_dir: str, base: str) -> None:
    """Post-promote cleanup, replayable: delete the epoch dirs listed
    in the base's fold manifest, drop the displaced old base, then
    remove the manifest (last — its presence is what marks the cleanup
    as still pending)."""
    manifest = os.path.join(base, _MANIFEST)
    with open(manifest) as fh:
        folded = [int(line) for line in fh.read().split() if line]
    for e in folded:
        if e != BASE_EPOCH:
            shutil.rmtree(os.path.join(table_dir, f"epoch={e}"), ignore_errors=True)
    shutil.rmtree(os.path.join(table_dir, _OLD_NAME), ignore_errors=True)
    os.remove(manifest)


def _special_dirs(table_dir: str) -> "list[tuple[int, str]]":
    """(epoch, path) of every NEGATIVE epoch dir — the base (-1) plus
    the L1 run dirs (-2, -3, …), the only places fold manifests live."""
    out = []
    if not os.path.isdir(table_dir):
        return out
    for d in os.listdir(table_dir):
        if not d.startswith("epoch="):
            continue
        v = d.split("=", 1)[1]
        if v.lstrip("-").isdigit() and int(v) < 0:
            out.append((int(v), os.path.join(table_dir, d)))
    return out


def pending_folded(table_dir: str) -> "set[int]":
    """Epochs a crashed compaction already FOLDED into a surviving
    target (the base, or an L1 run) but did not finish cleaning up: the
    fold manifest is still sitting in the target, so the folded rows
    exist TWICE — in the target AND in the still-present source dirs
    (whose commit markers also still exist). Until the next compaction
    replays the cleanup, any reader that unions target + source dirs
    would double-count them (inflated BM25 tf/dfreq, duplicate ANN
    candidates).

    Readers therefore subtract this set from their epoch view (a
    target's OWN id is never in the returned set — it IS the surviving
    copy; a major fold's manifest CAN list L1 run ids, which then are
    excluded like any other folded source). This is the read-only half
    of crash recovery: no writes, no race with a concurrently-running
    compactor, and per-table — a crash between two tables' compactions
    leaves each table individually consistent under its own pending
    set."""
    out: set[int] = set()
    for e, d in _special_dirs(table_dir):
        try:
            with open(os.path.join(d, _MANIFEST)) as fh:
                folded = {int(x) for x in fh.read().split() if x}
        except (OSError, ValueError):
            continue
        folded.discard(e)
        out |= folded
    out.discard(BASE_EPOCH)
    return out


def _recover(table_dir: str) -> None:
    """Finish or roll back an interrupted swap so the table is always
    in a readable, compactable state on entry. Idempotent.

    Crash windows of the swap (write tmp → manifest → move base aside
    → promote tmp → cleanup):
    - base present, manifest in base → crash during cleanup: replay it
      (delete the folded epoch dirs it lists, drop old).
    - base absent, tmp complete → crash between move-aside and promote:
      promote tmp, then replay cleanup from its manifest.
    - base absent, tmp incomplete/missing → roll back (restore the
      displaced old base, or the legacy ``epoch=-1.old`` a pre-fix
      version may have left).
    - any other leftover tmp/old is stale and discarded.
    """
    tmp = os.path.join(table_dir, _TMP_NAME)
    old = os.path.join(table_dir, _OLD_NAME)
    legacy_old = os.path.join(table_dir, f"epoch={BASE_EPOCH}.old")
    base = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
    if not os.path.exists(base):
        if os.path.exists(tmp) and _is_complete(tmp):
            os.rename(tmp, base)
        elif os.path.exists(old):
            os.rename(old, base)
        elif os.path.exists(legacy_old):
            os.rename(legacy_old, base)
    if os.path.isfile(os.path.join(base, _MANIFEST)):
        _finish_swap(table_dir, base)
    # whatever remains is stale state from a finished or abandoned swap
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(legacy_old, ignore_errors=True)
    _recover_l1(table_dir)


def _next_run_id(table_dir: str) -> int:
    """The next free L1 run id: one below the most negative special
    epoch present (the base, -1, is always occupied conceptually, so
    the first run is -2). Restarts after a major fold deletes the
    runs."""
    ids = [e for e, _ in _special_dirs(table_dir)]
    return min(ids + [BASE_EPOCH]) - 1


def _recover_l1(table_dir: str) -> None:
    """Finish or discard an interrupted MINOR (L0→L1) fold. The minor
    swap is simpler than the base swap — the target run dir is a fresh
    name, so promotion is one rename and nothing is moved aside:
    write tmp → manifest → rename tmp to ``epoch=-K`` → cleanup.

    - tmp complete (manifest landed) → promote to the next free run id
      and replay its cleanup (the folded L0 dirs still exist).
    - tmp incomplete → discard (the L0 sources are untouched; the next
      fold redoes the work).
    - a promoted run still carrying its manifest → crash during
      cleanup: replay it (delete the folded L0 dirs it lists).
    Idempotent; single-writer like every compaction entry."""
    tmp = os.path.join(table_dir, _TMP_L1)
    if os.path.exists(tmp):
        if _is_complete(tmp):
            os.rename(tmp, os.path.join(table_dir, f"epoch={_next_run_id(table_dir)}"))
        else:
            shutil.rmtree(tmp, ignore_errors=True)
    for e, d in _special_dirs(table_dir):
        if e != BASE_EPOCH and os.path.isfile(os.path.join(d, _MANIFEST)):
            _finish_swap(table_dir, d)


def migrate_flat_state(table_dir: str) -> int:
    """One-time layout migration for pre-epoch (append-mode) state
    tables. Legacy dirs hold their part files at the table ROOT; the
    moment a new ingest writes an ``epoch=N`` subdir next to them,
    Spark's partition discovery silently ignores the root-level files —
    the whole legacy index vanishes from reads with no error. (A
    schema-supplied ``epoch`` column reads NULL on a purely-flat dir,
    which ``coalesce(epoch, -1)`` probes handle, but the MIXED layout
    is unreadable, so migration on entry is the only safe upgrade.)

    Moves every root-level data file into the compaction base partition
    ``epoch=-1``, where all readers (partition discovery, the
    own-epoch probe exclusion, :func:`compact_epochs`) treat the rows
    exactly like compacted history. Pure renames, idempotent,
    single-writer (same contract as compaction). Returns the number of
    files moved."""
    if not os.path.isdir(table_dir):
        return 0
    flat = [
        n
        for n in os.listdir(table_dir)
        if os.path.isfile(os.path.join(table_dir, n))
        and not n.startswith(("_", "."))
        and not n.endswith(".crc")
    ]
    if not flat:
        return 0
    base = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
    os.makedirs(base, exist_ok=True)
    for n in flat:
        # "legacy-" prefix: cannot collide with a part file an earlier
        # compaction already placed in the base
        os.rename(os.path.join(table_dir, n), os.path.join(base, f"legacy-{n}"))
    return len(flat)


COMMITS_NAME = "_commits"


def publish_epoch_marker(state_dir: str, epoch: int, payload=None) -> None:
    """Atomically publish an epoch for a MULTI-TABLE streaming state:
    write the ``_commits/epoch=N`` marker AFTER every table's write has
    landed, so readers that take the marker set as their frontier
    (:func:`committed_frontier`) never see an epoch some of whose
    tables are missing (the r11 invariant, first implemented for the
    unified search state — search_stream.py::make_search_ingest).

    ``payload``: optional JSON-serializable stats dict that rides
    inside the marker under the same atomic publish (the r12 pattern —
    e.g. per-epoch row counts a router reads with zero Spark jobs).
    The tmp name must NOT share the ``epoch=`` prefix the listers
    match — a crash-leftover tmp would parse as a bogus epoch."""
    import json

    commits = os.path.join(state_dir, COMMITS_NAME)
    os.makedirs(commits, exist_ok=True)
    tmp = os.path.join(commits, f".tmp-epoch-{int(epoch)}")
    with open(tmp, "w") as fh:
        if payload is not None:
            json.dump(payload, fh)
    os.replace(tmp, os.path.join(commits, f"epoch={int(epoch)}"))


def committed_frontier(state_dir: str) -> "list[int] | None":
    """The readable epoch frontier of a marker-published state:
    the always-committed negative compaction epochs are implied (every
    reader keeps them); the returned list is ``[-1]`` + every epoch
    whose commit marker landed.

    Returns ``None`` for a state that has never written markers (no
    ``_commits`` dir) — the pre-r13 dedup/media states published
    epochs by the table writes themselves, so "no frontier" must mean
    read-everything, not read-nothing. The first post-upgrade ingest
    adopts those legacy epochs (:func:`adopt_unmarked_epochs`) and the
    state becomes marker-published from then on."""
    commits = os.path.join(state_dir, COMMITS_NAME)
    if not os.path.isdir(commits):
        return None
    eps = [BASE_EPOCH]
    for n in os.listdir(commits):
        if n.startswith("epoch="):
            eps.append(int(n.split("=", 1)[1]))
    return sorted(eps)


def adopt_unmarked_epochs(state_dir: str, tables) -> "list[int]":
    """First-upgrade migration to the marker frontier: when the
    ``_commits`` dir does not exist yet but epoch dirs do (a state
    built by a pre-marker ingest loop), mark every existing
    non-negative epoch committed — under the old semantics those
    epochs were already visible to every reader, so adopting them
    changes nothing; NOT adopting them would vanish the whole legacy
    state the moment the first marker lands. A partial crash epoch
    from before the upgrade gets adopted too, exactly as visible as it
    was — the stream's retry of that epoch overwrites and re-marks it.
    Idempotent; returns the adopted epoch ids."""
    commits = os.path.join(state_dir, COMMITS_NAME)
    if os.path.isdir(commits):
        return []
    eps: set[int] = set()
    for t in tables:
        d = os.path.join(state_dir, t)
        if not os.path.isdir(d):
            continue
        for n in os.listdir(d):
            if n.startswith("epoch="):
                v = n.split("=", 1)[1]
                if v.lstrip("-").isdigit() and int(v) >= 0:
                    eps.add(int(v))
    for e in sorted(eps):
        publish_epoch_marker(state_dir, e)
    if not eps:
        # state exists but holds only flat/legacy or base rows: still
        # create the dir so the state is marker-published from now on
        os.makedirs(commits, exist_ok=True)
    return sorted(eps)


def prune_stale_markers(state_dir: str, tables=None) -> int:
    """Drop commit markers for epochs no table holds anymore — their
    rows were folded into the always-committed base by compaction, so
    the frontier stays correct and the marker listing stays bounded by
    live epochs. Returns the number of markers removed. (The unified
    search state has its own pruner that also absorbs marker stats
    payloads — search_stream.compact_unified_search_state.)

    ``tables=None`` scans EVERY table dir under the state dir — the
    safe default for shared multi-modality state dirs (r13 admission
    state): a compactor that pruned against only ITS tables would drop
    markers for epochs another modality's table still holds, vanishing
    those rows from the frontier.

    ORDER IS LOAD-BEARING (r14, found by the concurrent ingest-vs-
    compactor stress test): the marker set is snapshotted BEFORE the
    live-epoch listing. Every ingest writes its table dirs before its
    marker, so any marker in the snapshot either still has its dirs
    (seen by the later listing -> kept) or compaction already folded
    them into the always-committed base (-> safe to prune). The old
    tables-first order had a window where an ingest landed dirs +
    marker between the two listings and its FRESH marker was pruned —
    a committed epoch invisible until the next full fold."""
    commits = os.path.join(state_dir, COMMITS_NAME)
    if not os.path.isdir(commits):
        return 0
    marker_snapshot = [n for n in os.listdir(commits) if n.startswith("epoch=")]
    if tables is None:
        tables = [
            n
            for n in os.listdir(state_dir)
            if os.path.isdir(os.path.join(state_dir, n))
            and not n.startswith(("_", "."))
        ]
    live: set[int] = set()
    for t in tables:
        d = os.path.join(state_dir, t)
        if not os.path.isdir(d):
            continue
        for n in os.listdir(d):
            if n.startswith("epoch=") and n.split("=", 1)[1].lstrip("-").isdigit():
                live.add(int(n.split("=", 1)[1]))
    removed = 0
    for n in marker_snapshot:
        if int(n.split("=", 1)[1]) not in live:
            try:
                os.remove(os.path.join(commits, n))
            except FileNotFoundError:
                continue  # a concurrent pruner got there first
            removed += 1
    return removed


def compact_epochs(
    spark: SparkSession,
    table_dir: str,
    partition_by: list[str] | None = None,
    augment=None,
    extra_manifest: "dict[str, str] | None" = None,
    fold_all: bool = False,
) -> int:
    """Fold all committed epochs of one state table into the
    ``epoch=-1`` base partition. Returns the number of epoch
    directories folded (0 = nothing to do). ``partition_by`` preserves
    an inner partitioning (e.g. ``["cell"]`` for the IVF index).
    ``augment`` (df → df) lets a caller derive layout columns before
    the rewrite (e.g. the band index's bucket-hash partition key);
    ``extra_manifest`` files are written into the new base alongside
    the fold manifest (underscore-prefixed names only — Spark reads
    skip them) so layout metadata travels with the base through the
    atomic swap. Self-recovers from a crash mid-swap (see
    ``_recover``)."""
    if not os.path.exists(table_dir):
        return 0
    _recover(table_dir)
    migrate_flat_state(table_dir)
    epochs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("epoch=") and d.split("=", 1)[1].lstrip("-").isdigit()
    )
    if not epochs:
        return 0
    # the newest STREAM epoch is normally left alone — it may still be
    # retried by the stream, and a retry overwrites its own epoch dir.
    # Special epochs (the base -1, L1 runs -2…) are compaction
    # artifacts, never retried, so they never count as "newest".
    # ``fold_all`` folds the newest too: for maintenance that runs with
    # the STREAM STOPPED (every epoch committed), e.g. an index rebuild
    # that must re-derive layout columns for every row.
    newest = max([e for e in epochs if e >= 0], default=None)
    fold = epochs if fold_all else [e for e in epochs if e != newest]
    if not fold or (fold == [BASE_EPOCH] and not fold_all):
        # nothing, or only the base itself — rewriting it alone is a
        # full-index write for zero consolidation. EXCEPT under
        # fold_all: model rebuilds exist precisely to rewrite the base
        # under a new augment (refresh_ivf_model/refresh_pq_model on an
        # already-compacted table).
        return 0

    # ONE multi-path read for every flat delta epoch (they share a
    # writer, hence a uniform directory depth — one partition-discovery
    # pass covers a 500-batch backlog instead of 500 sequential reads
    # and an O(backlog)-deep union chain); ONLY the base is read
    # separately, because a compacted base may carry a layout partition
    # the deltas lack (the band index's bkt= subdirs) and Spark rejects
    # mixed-depth partition discovery. epoch is dropped — the base
    # partition re-assigns it; a base-only bkt fills NULL through
    # allowMissingColumns and the augment/partition_by recomputes it.
    flat_fold = [e for e in fold if e != BASE_EPOCH]
    frames = []
    if flat_fold:
        frames.append(
            spark.read.option("basePath", table_dir)
            .parquet(*[os.path.join(table_dir, f"epoch={e}") for e in flat_fold])
            .drop("epoch")
        )
    if BASE_EPOCH in fold:
        frames.append(
            spark.read.parquet(os.path.join(table_dir, f"epoch={BASE_EPOCH}"))
        )
    src = frames[0]
    for f in frames[1:]:
        src = src.unionByName(f, allowMissingColumns=True)
    if augment is not None:
        src = augment(src)
    tmp = os.path.join(table_dir, _TMP_NAME)
    writer = src.coalesce(max(1, len(fold) // 8)).write.mode("overwrite")
    if partition_by:
        # repartition on the partition key first: otherwise every input
        # task writes one file into every partition dir it holds rows
        # for — tasks × dirs tiny files (measured: a 40k-row band base
        # compacted into 2,560 16-row files). One shuffle, one file per
        # dir.
        writer = (
            src.repartition(*[F.col(c) for c in partition_by])
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    writer.parquet(tmp)
    for name, body in (extra_manifest or {}).items():
        with open(os.path.join(tmp, name), "w") as fh:
            fh.write(body)
    with open(os.path.join(tmp, _MANIFEST), "w") as fh:
        fh.write("\n".join(str(e) for e in fold))

    base = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
    old = os.path.join(table_dir, _OLD_NAME)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    _finish_swap(table_dir, base)
    return len(fold)


def fold_to_l1(
    spark: SparkSession,
    table_dir: str,
    partition_by: list[str] | None = None,
    min_epochs: int = 2,
    augment=None,
) -> int:
    """MINOR fold: consolidate the committed delta epochs (L0) into ONE
    new L1 run directory (``epoch=-K``) without touching the base or
    earlier runs — cost ∝ the folded deltas, never the index. This is
    what keeps a long-running ingest's maintenance tick O(delta): the
    small-files problem is solved per tick, and the O(full base)
    rewrite is deferred until L1 actually amounts to something
    (:func:`compact_epochs_tiered`).

    ``partition_by`` must match the DELTA dirs' layout (e.g.
    ``["cell"]`` for the IVF tables, whose stream writes
    partitionBy(cell)): runs sit at the deltas' directory depth so
    every flat-side reader keeps working unchanged. ``min_epochs``
    skips the fold (and its read/write) when fewer committed deltas
    than that are waiting — a run per micro-batch would just rename
    the small-files problem. Crash-safe: write tmp → manifest →
    one rename → cleanup (see ``_recover_l1``). Returns the number of
    L0 epochs folded."""
    if not os.path.exists(table_dir):
        return 0
    _recover(table_dir)
    migrate_flat_state(table_dir)
    l0 = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("epoch=")
        and d.split("=", 1)[1].isdigit()  # non-negative only
    )
    if not l0:
        return 0
    fold = l0[:-1]  # newest stays — it may still be retried
    if len(fold) < int(min_epochs):
        return 0
    src = (
        spark.read.option("basePath", table_dir)
        .parquet(*[os.path.join(table_dir, f"epoch={e}") for e in fold])
        .drop("epoch")
    )
    if augment is not None:
        # same contract as compact_epochs' augment: a df→df collapse /
        # layout derivation applied to the folded rows (r14 ADVICE —
        # without it the bloom table's bit_or collapse only ran on the
        # full-fold path and L1 runs accumulated one word-frame per
        # folded epoch, the unbounded read-side-OR growth the collapse
        # exists to prevent)
        src = augment(src)
    tmp = os.path.join(table_dir, _TMP_L1)
    if partition_by:
        (
            src.repartition(*[F.col(c) for c in partition_by])
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(tmp)
        )
    else:
        src.coalesce(max(1, len(fold) // 8)).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MANIFEST), "w") as fh:
        fh.write("\n".join(str(e) for e in fold))
    run = os.path.join(table_dir, f"epoch={_next_run_id(table_dir)}")
    os.rename(tmp, run)
    _finish_swap(table_dir, run)
    return len(fold)


def replace_table(
    spark: SparkSession,
    table_dir: str,
    src: "DataFrame",
    partition_by: list[str] | None = None,
) -> None:
    """Atomically replace a state table's ENTIRE contents with a fresh
    derivation — the model-rebuild write (refresh_pq_model re-encodes
    every persisted vector under new codebooks; the old rows are not
    folded, they are superseded). Same crash-safe swap as
    ``compact_epochs``: write tmp → manifest (listing every live epoch
    dir, so the replayable cleanup deletes them) → move base aside →
    promote → cleanup; a crash at any point is healed by ``_recover``
    on the next entry, and ``pending_folded`` keeps readers from
    double-counting during the promote-to-cleanup window."""
    os.makedirs(table_dir, exist_ok=True)
    _recover(table_dir)
    migrate_flat_state(table_dir)
    live = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("epoch=") and d.split("=", 1)[1].lstrip("-").isdigit()
    )
    tmp = os.path.join(table_dir, _TMP_NAME)
    if partition_by:
        (
            src.repartition(*[F.col(c) for c in partition_by])
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(tmp)
        )
    else:
        src.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MANIFEST), "w") as fh:
        fh.write("\n".join(str(e) for e in live))
    base = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
    old = os.path.join(table_dir, _OLD_NAME)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    _finish_swap(table_dir, base)


def _dir_bytes(d: str) -> int:
    """Total data bytes under a directory (local-FS walk; on a real
    cluster this is one FileSystem.getContentSummary call). Underscore
    manifests are noise-level and included."""
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def l1_pressure(table_dir: str) -> "tuple[int, int]":
    """(l1_bytes, base_bytes) — the major-fold trigger inputs."""
    l1 = 0
    base = 0
    for e, d in _special_dirs(table_dir):
        if e == BASE_EPOCH:
            base = _dir_bytes(d)
        else:
            l1 += _dir_bytes(d)
    return l1, base


def compact_epochs_tiered(
    spark: SparkSession,
    table_dir: str,
    key_col: "str | None" = None,
    partition_by: list[str] | None = None,
    l1_fraction: float = 0.25,
    min_epochs: int = 2,
    augment=None,
) -> dict:
    """Leveled compaction tick — the maintenance entry a long-running
    ingest should call instead of the full fold:

    1. MINOR: committed L0 epochs → one new L1 run (cost ∝ delta).
    2. MAJOR: only when accumulated L1 bytes ≥ ``l1_fraction`` × base
       bytes (or there is no base yet), rewrite base + runs + remaining
       committed L0 via the full fold — ``key_col`` routes hash-bucketed
       tables through :func:`compact_hashed_epochs` (bucket count
       recomputed for the grown corpus), ``partition_by`` preserves an
       inner layout (IVF ``cell``).

    Write amplification per ingested byte is 1 (its minor fold) +
    1/l1_fraction-amortized major rewrites — the leveled-LSM bound —
    instead of one full-base rewrite per tick. Returns
    ``{"minor": n_l0_folded, "major": n_dirs_folded, "l1_bytes": …,
    "base_bytes": …}``."""
    if augment is not None and key_col is not None:
        raise ValueError(
            "augment is not supported with key_col (the hashed fold "
            "derives its own bucket layout); use one or the other"
        )
    minor = fold_to_l1(
        spark,
        table_dir,
        partition_by=partition_by,
        min_epochs=min_epochs,
        augment=augment,
    )
    l1_b, base_b = l1_pressure(table_dir)
    major = 0
    if l1_b > 0 and (base_b == 0 or l1_b >= float(l1_fraction) * base_b):
        if key_col is not None:
            major = compact_hashed_epochs(spark, table_dir, key_col)
        else:
            major = compact_epochs(
                spark, table_dir, partition_by=partition_by, augment=augment
            )
    return {
        "minor": minor,
        "major": major,
        "l1_bytes": l1_b,
        "base_bytes": base_b,
    }


_NBUCKETS_MANIFEST = "_NBUCKETS"

#: target rows per bucket dir in the compacted band index — the knob
#: that makes the bucket count GROW with the corpus (the auto_lsh_bits
#: rule: any blocking key whose cardinality doesn't grow with the
#: corpus is a quadratic in waiting — here, a probe that stops pruning)
_BAND_ROWS_PER_BUCKET = 4096
_BAND_MIN_BUCKETS = 16
_BAND_MAX_BUCKETS = 65536


def band_bucket_expr(bucket_col, n_buckets: int):
    """The band index's layout partition key: a stable hash of the LSH
    bucket string into ``n_buckets`` directories. Pure function of the
    row — the probe recomputes it on the delta side to get the touched
    directory set."""
    return F.pmod(F.xxhash64(bucket_col), F.lit(int(n_buckets))).cast("int")


def read_nbuckets(table_dir: str) -> "int | None":
    """The bucket count of the table's compacted base, or None when the
    base is absent / pre-bucketing flat (probes then full-scan it, the
    legacy behavior)."""
    try:
        with open(
            os.path.join(table_dir, f"epoch={BASE_EPOCH}", _NBUCKETS_MANIFEST)
        ) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def split_bucketed_table(spark: SparkSession, table_dir: str, schema: str):
    """The ONE reader decomposition of a (possibly) hash-bucketed state
    table — shared by every probe/serve path so layout fixes land once:
    returns ``(n_buckets, flat_df, base_df)`` where

    - ``flat_df`` reads the flat epoch dirs with the ``epoch``
      partition column attached (``None`` when there are none). With no
      bucketed base it covers EVERY epoch dir including ``epoch=-1``
      (uniform depth — one partition-discovery pass).
    - ``base_df`` reads the bucketed base with the ``bkt`` partition
      column attached (``None`` unless an ``_NBUCKETS`` manifest marks
      the base as bucketed). The mixed-depth tree (flat siblings next
      to ``bkt=`` subdirs) is exactly why the halves cannot share one
      read.

    Callers apply their own epoch filters (frontier list vs own-epoch
    exclusion) to ``flat_df`` and their own ``bkt IN`` prune to
    ``base_df``. ``schema`` is the DATA schema (no epoch/bkt)."""
    if not os.path.isdir(table_dir):
        return None, None, None
    nb = read_nbuckets(table_dir)
    base_name = f"epoch={BASE_EPOCH}"
    flat_dirs = [
        os.path.join(table_dir, d)
        for d in sorted(os.listdir(table_dir))
        if d.startswith("epoch=")
        and d.split("=", 1)[1].lstrip("-").isdigit()
        and not (nb is not None and d == base_name)
    ]
    flat = None
    if flat_dirs:
        flat = (
            spark.read.schema(schema + ", epoch long")
            .option("basePath", table_dir)
            .parquet(*flat_dirs)
        )
    base = None
    base_dir = os.path.join(table_dir, base_name)
    if nb is not None and os.path.isdir(base_dir):
        base = (
            spark.read.schema(schema + ", bkt int")
            .option("basePath", base_dir)
            .parquet(base_dir)
        )
    return nb, flat, base


def compact_hashed_epochs(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    n_buckets: "int | None" = None,
) -> int:
    """Compact a state table with the HASH-BUCKETED base layout: the
    folded rows are written partitioned by ``bkt = hash(key_col) %
    n_buckets``, so a probe reads only the directories its delta's
    keys hash into (literal ``bkt IN`` → directory-level pruning)
    instead of scanning the whole index. ``n_buckets`` defaults to
    rows/4096 clamped to [16, 65536] — it grows with the corpus,
    keeping the pruned fraction ∝ delta/corpus (the LSM shape: small
    flat delta epochs, one bucket-indexed base). The count is recorded
    in the base's ``_NBUCKETS`` manifest (travels through the atomic
    swap; re-compaction recomputes it for the grown corpus). Mirrors
    the reference's bucket-index routing
    (app/server/gateway/bucket_planner.go:55-123)."""
    if n_buckets is None:
        live = [
            os.path.join(table_dir, d)
            for d in (os.listdir(table_dir) if os.path.isdir(table_dir) else [])
            if d.startswith("epoch=")
        ]
        if not live:
            return 0
        # TWO count jobs, not one per epoch dir (a 500-batch backlog
        # would run 500 sequential jobs before folding starts): all
        # flat dirs share one partition-discovery pass; only the
        # bkt-partitioned base needs its own (mixed depth)
        base_dir = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
        has_bucketed_base = read_nbuckets(table_dir) is not None
        flat = [d for d in live if not (has_bucketed_base and d == base_dir)]
        rows = 0
        if flat:
            rows += spark.read.option("basePath", table_dir).parquet(*flat).count()
        if has_bucketed_base and base_dir in live:
            rows += spark.read.parquet(base_dir).count()
        n_buckets = min(
            _BAND_MAX_BUCKETS,
            max(_BAND_MIN_BUCKETS, 1 << max(0, rows // _BAND_ROWS_PER_BUCKET).bit_length()),
        )

    def aug(df):
        return df.drop("bkt").withColumn(
            "bkt", band_bucket_expr(F.col(key_col), n_buckets)
        )

    return compact_epochs(
        spark,
        table_dir,
        partition_by=["bkt"],
        augment=aug,
        extra_manifest={_NBUCKETS_MANIFEST: str(int(n_buckets))},
    )


def compact_band_epochs(
    spark: SparkSession, table_dir: str, n_buckets: "int | None" = None
) -> int:
    """The LSH band index's :func:`compact_hashed_epochs` (keyed by the
    band bucket string — probes prune to the delta's buckets)."""
    return compact_hashed_epochs(spark, table_dir, "bucket", n_buckets)


def compact_neardup_state(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id", tiered: bool = False
) -> dict:
    """Compact all three near-dup ingest tables. The band index is
    bucketed by the LSH bucket string (probes prune to the delta's
    buckets); the shingle table is bucketed by doc id (the verify join
    prunes to the candidate partner ids' buckets — the OTHER O(index)
    read the r9 stream stress surfaced). Returns
    {table: folded_epochs}.

    ``tiered=True`` routes every table through
    :func:`compact_epochs_tiered` — the maintenance tick for a
    long-running ingest: minor folds cost O(delta), and the full base
    rewrite runs only when L1 pressure warrants it. Returns the tiered
    per-table dicts instead of fold counts.

    Commit markers for fully-folded epochs are pruned afterwards
    (:func:`prune_stale_markers`) — the folded rows live in the
    always-committed base, so the frontier keeps resolving."""
    if tiered:
        out = {
            "pairs": compact_epochs_tiered(spark, os.path.join(state_dir, "pairs")),
            "bands": compact_epochs_tiered(
                spark, os.path.join(state_dir, "bands"), key_col="bucket"
            ),
            "shingles": compact_epochs_tiered(
                spark, os.path.join(state_dir, "shingles"), key_col=id_col
            ),
        }
    else:
        out = {
            "pairs": compact_epochs(spark, os.path.join(state_dir, "pairs")),
            "bands": compact_band_epochs(spark, os.path.join(state_dir, "bands")),
            "shingles": compact_hashed_epochs(
                spark, os.path.join(state_dir, "shingles"), id_col
            ),
        }
    prune_stale_markers(state_dir)
    return out


def compact_media_state(
    spark: SparkSession, state_dir: str, tiered: bool = False
) -> dict:
    """Compact the media near-dup ingest state (streaming/
    media_stream.py). Both tables fold FLAT: the fingerprint index is
    16 bytes/item and every probe is a blocked equi-join on the
    hash-chunk key (not a point read by media_id), so a hash-bucketed
    base would add a shuffle at fold time and prune nothing at probe
    time; ``pairs/`` is output-sized and read whole. Stale commit
    markers pruned after (:func:`prune_stale_markers`)."""
    if tiered:
        out = {
            "pairs": compact_epochs_tiered(spark, os.path.join(state_dir, "pairs")),
            "hashes": compact_epochs_tiered(
                spark, os.path.join(state_dir, "hashes")
            ),
        }
    else:
        out = {
            "pairs": compact_epochs(spark, os.path.join(state_dir, "pairs")),
            "hashes": compact_epochs(spark, os.path.join(state_dir, "hashes")),
        }
    prune_stale_markers(state_dir)
    return out


def compact_ivf_state(
    spark: SparkSession, state_dir: str, tiered: bool = False
) -> dict:
    """Compact the IVF cell index, preserving the cell partitioning
    (the probe's partition pruning must keep working on the base —
    and, tiered, on the L1 runs, which carry the same cell= layout)."""
    if tiered:
        return {
            "cells": compact_epochs_tiered(
                spark, os.path.join(state_dir, "cells"), partition_by=["cell"]
            )
        }
    return {
        "cells": compact_epochs(
            spark, os.path.join(state_dir, "cells"), partition_by=["cell"]
        )
    }


def compact_search_state(
    spark: SparkSession, state_dir: str, tiered: bool = False
) -> dict:
    """Compact the incremental search index's tables (tf-bearing
    postings + doc lengths, streaming/search_stream.py). The postings
    base is WORD-hash-bucketed so a BM25 serving read prunes to the
    query words' directories (persisted_postings ``words=``); doclen
    stays flat — corpus stats (N, avgdl) need every row anyway.
    ``tiered=True``: the O(delta) leveled maintenance tick
    (:func:`compact_epochs_tiered`)."""
    if tiered:
        return {
            "postings": compact_epochs_tiered(
                spark, os.path.join(state_dir, "postings"), key_col="word"
            ),
            "doclen": compact_epochs_tiered(spark, os.path.join(state_dir, "doclen")),
        }
    return {
        "postings": compact_hashed_epochs(
            spark, os.path.join(state_dir, "postings"), "word"
        ),
        "doclen": compact_epochs(spark, os.path.join(state_dir, "doclen")),
    }
