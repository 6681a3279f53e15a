"""Reactivity: Subscribe (snapshot-then-live), SubscribeToInfo, and the
TTL-queue claim loop on Structured Streaming (SURVEY.md §2.9).

Reference semantics reproduced:

- ``SubscribeToEvents`` (proto:342-363): every mutation emits a typed
  change event — NEW/UPDATED/DELETED with old+new payload — delivered
  FIFO per swamp. Here: a parquet file stream over the store's change
  log; the store writes one file per commit batch, and the file stream
  processes files in order, so subscribers observe commit order. On a
  cluster the same contract holds per partition (SURVEY §7: FIFO is
  per-swamp == per-partition ordering).
- snapshot-then-live (SDK ``getExistingData``, hydraidego.go:4757+):
  existing rows first, then live events. A parquet stream source reads
  pre-existing files before new ones, which IS that contract; the
  helper additionally exposes the snapshot as a batch frame for callers
  that want the reference's two-phase callback shape.
- ``SubscribeToInfo`` (proto:365-376): live element count on every
  change — a streaming aggregation over the event ops (+1 NEW, -1
  DELETED) on top of the snapshot count.
- TTL claim loop (``ShiftExpired``/``PatchExpired`` polling):
  a rate-source tick driving one serialized claim transaction per
  micro-batch via foreachBatch — claims are disjoint because the store
  applier is the single writer (the reference gets this from the
  per-swamp mutex).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.store import CHANGE_SCHEMA, TreasureStore


def subscribe(spark: SparkSession, store: TreasureStore) -> DataFrame:
    """Streaming DataFrame of change events (op, key, new, old,
    event_time, batch_id), FIFO in commit order."""
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 32)
        .parquet(store.changes_dir)
    )


def subscribe_snapshot_then_live(
    spark: SparkSession, store: TreasureStore
) -> tuple[DataFrame, DataFrame]:
    """(snapshot, live): current state as a batch frame + the event
    stream. The stream includes the events that *produced* the snapshot
    (replay-from-zero semantics, like reading a Delta CDF from version
    0); consumers that only want post-snapshot events filter on
    batch_id > store.version at subscription time."""
    return store.current(), subscribe(spark, store)


def subscribe_to_info(
    spark: SparkSession, store: TreasureStore
) -> DataFrame:
    """Live element count: snapshot count + running (+NEW -DELETED) over
    events committed AFTER the snapshot (batch_id > snapshot version —
    replayed history would double-count). Emitted as one row per trigger."""
    snapshot_version = store.version
    base_count = store.current().count()
    events = subscribe(spark, store).filter(F.col("batch_id") > snapshot_version)
    delta = (
        F.sum(
            F.when(F.col("op") == "NEW", 1)
            .when(F.col("op") == "DELETED", -1)
            .otherwise(0)
        )
    )
    return events.agg((F.lit(base_count) + F.coalesce(delta, F.lit(0))).alias("count"))


def run_ttl_claim_loop(
    spark: SparkSession,
    store: TreasureStore,
    how_many: int,
    on_claim: Optional[Callable[[DataFrame, int], None]] = None,
    tick_seconds: int = 1,
    queue_name: str = "ttl_claims",
):
    """Continuous TTL-queue worker: every tick runs ONE serialized
    shift-expired transaction against the store and hands the claimed
    rows to ``on_claim``. Returns the StreamingQuery (caller stops it).

    foreachBatch gives exactly-once per tick against the store's applier;
    two loops on the same store still claim disjoint sets because each
    claim is a full snapshot-swap transaction."""

    def tick(_batch_df: DataFrame, epoch: int) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        claimed = store.shift_expired(now, how_many)
        if on_claim is not None:
            on_claim(claimed, epoch)

    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return (
        rate.writeStream.trigger(processingTime=f"{tick_seconds} seconds")
        .outputMode("append")
        .queryName(queue_name)
        .foreachBatch(tick)
        .start()
    )
