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
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

BASE_EPOCH = -1

_TMP_NAME = "_compacting"
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


def pending_folded(table_dir: str) -> "set[int]":
    """Epochs a crashed compaction already FOLDED into the base but did
    not finish cleaning up: the fold manifest is still sitting in the
    base, so the folded rows exist TWICE — in the new base AND in the
    still-present epoch dirs (whose commit markers also still exist).
    Until the next ``compact_epochs`` replays the cleanup, any reader
    that unions base + epoch dirs would double-count them (inflated
    BM25 tf/dfreq, duplicate ANN candidates).

    Readers therefore subtract this set from their epoch view (the
    base, ``-1``, is never in the returned set — it IS the surviving
    copy). This is the read-only half of crash recovery: no writes, no
    race with a concurrently-running compactor, and per-table — a crash
    between two tables' compactions leaves each table individually
    consistent under its own pending set."""
    manifest = os.path.join(table_dir, f"epoch={BASE_EPOCH}", _MANIFEST)
    try:
        with open(manifest) as fh:
            folded = {int(x) for x in fh.read().split() if x}
    except (OSError, ValueError):
        return set()
    folded.discard(BASE_EPOCH)
    return folded


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
    # the newest epoch is normally left alone — it may still be retried
    # by the stream, and a retry overwrites its own epoch dir.
    # ``fold_all`` folds it too: for maintenance that runs with the
    # STREAM STOPPED (every epoch committed), e.g. an index rebuild
    # that must re-derive layout columns for every row.
    newest = max(epochs)
    fold = epochs if fold_all else [e for e in epochs if e != newest]
    if not fold:
        return 0

    # per-dir reads unioned by name, NOT one multi-path read: the base
    # may carry a layout partition the delta epochs lack (the band
    # index's bkt= subdirs) and Spark rejects mixed-depth partition
    # discovery. Reading each epoch dir alone keeps its own inner
    # partition cols (cell=, bkt=) resolving; missing ones fill NULL
    # and the augment/partition_by recomputes them. epoch itself is
    # dropped — the base partition re-assigns it.
    frames = []
    for e in fold:
        f = spark.read.parquet(os.path.join(table_dir, f"epoch={e}"))
        frames.append(f.drop("epoch"))
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
    spark: SparkSession, state_dir: str, id_col: str = "doc_id"
) -> dict:
    """Compact all three near-dup ingest tables. The band index is
    bucketed by the LSH bucket string (probes prune to the delta's
    buckets); the shingle table is bucketed by doc id (the verify join
    prunes to the candidate partner ids' buckets — the OTHER O(index)
    read the r9 stream stress surfaced). Returns
    {table: folded_epochs}."""
    return {
        "pairs": compact_epochs(spark, os.path.join(state_dir, "pairs")),
        "bands": compact_band_epochs(spark, os.path.join(state_dir, "bands")),
        "shingles": compact_hashed_epochs(
            spark, os.path.join(state_dir, "shingles"), id_col
        ),
    }


def compact_ivf_state(spark: SparkSession, state_dir: str) -> dict:
    """Compact the IVF cell index, preserving the cell partitioning
    (the probe's partition pruning must keep working on the base)."""
    return {
        "cells": compact_epochs(
            spark, os.path.join(state_dir, "cells"), partition_by=["cell"]
        )
    }


def compact_search_state(spark: SparkSession, state_dir: str) -> dict:
    """Compact the incremental search index's tables (tf-bearing
    postings + doc lengths, streaming/search_stream.py). The postings
    base is WORD-hash-bucketed so a BM25 serving read prunes to the
    query words' directories (persisted_postings ``words=``); doclen
    stays flat — corpus stats (N, avgdl) need every row anyway."""
    return {
        "postings": compact_hashed_epochs(
            spark, os.path.join(state_dir, "postings"), "word"
        ),
        "doclen": compact_epochs(spark, os.path.join(state_dir, "doclen")),
    }
