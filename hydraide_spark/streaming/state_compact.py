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

Readers (``ingested_pairs``, ``persisted_cells``, the ingest probes)
are unchanged: they read the root with partition discovery and treat
``epoch`` as opaque except for the ≠ current-epoch exclusion.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

BASE_EPOCH = -1


def compact_epochs(
    spark: SparkSession,
    table_dir: str,
    partition_by: list[str] | None = None,
) -> int:
    """Fold all committed epochs of one state table into the
    ``epoch=-1`` base partition. Returns the number of epoch
    directories folded (0 = nothing to do). ``partition_by`` preserves
    an inner partitioning (e.g. ``["cell"]`` for the IVF index)."""
    if not os.path.exists(table_dir):
        return 0
    epochs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("epoch=")
    )
    if not epochs:
        return 0
    newest = max(epochs)
    fold = [e for e in epochs if e != newest]
    if not fold:
        return 0

    # basePath keeps inner partition dirs (e.g. cell=C) resolving as
    # columns when several epoch dirs are read together; the epoch
    # value itself is dropped — the base partition re-assigns it
    src = (
        spark.read.option("basePath", table_dir)
        .parquet(*[os.path.join(table_dir, f"epoch={e}") for e in fold])
        .drop("epoch")
    )
    tmp = os.path.join(table_dir, "_compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    writer = src.coalesce(max(1, len(fold) // 8)).write.mode("overwrite")
    if partition_by:
        writer = src.write.mode("overwrite").partitionBy(*partition_by)
    writer.parquet(tmp)

    base = os.path.join(table_dir, f"epoch={BASE_EPOCH}")
    old = base + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)
    for e in fold:
        if e != BASE_EPOCH:
            shutil.rmtree(os.path.join(table_dir, f"epoch={e}"), ignore_errors=True)
    return len(fold)


def compact_neardup_state(spark: SparkSession, state_dir: str) -> dict:
    """Compact all three near-dup ingest tables (pairs, bands,
    shingles). Returns {table: folded_epochs}."""
    return {
        t: compact_epochs(spark, os.path.join(state_dir, t))
        for t in ("pairs", "bands", "shingles")
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
    postings + doc lengths, streaming/search_stream.py)."""
    return {
        t: compact_epochs(spark, os.path.join(state_dir, t))
        for t in ("postings", "doclen")
    }
