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
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.store import CHANGE_SCHEMA, TreasureStore


def trigger_for(store: TreasureStore) -> dict:
    """writeStream trigger kwargs from the store's registered swamp
    settings: ``WriteInterval`` (proto:817-821) maps to the
    processing-time trigger — how often buffered changes move to the
    durable sink. Unregistered stores get the reference default (1 s,
    settings.go:270)."""
    sec = store.settings.write_interval_sec if store.settings is not None else 1
    return {"processingTime": f"{int(sec)} seconds"}


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


def subscribe_strict_fifo(
    spark: SparkSession,
    store: TreasureStore,
    on_events: Callable[[list, int], None],
    queue_name: str = "strict_subscriber",
    max_files_per_trigger: int = 32,
    gap_patience: int = 3,
):
    """Opt-in STRICT per-swamp FIFO delivery — the reference's full
    subscriber guarantee (README "insert/update/delete events in FIFO
    order"; fan-out hydra.go:950-1019 invokes a swamp's callbacks
    serially in commit order). The default :func:`subscribe` stream
    guarantees commit order only per partition (SURVEY §7): a
    micro-batch spanning several commit files is a multi-partition
    DataFrame whose rows a consumer observes interleaved across
    commits, and any repartition downstream loses file order entirely.

    Strict mode funnels the swamp's change stream through ONE ordered
    delivery point: each micro-batch is sorted by (batch_id, key) and
    handed to ``on_events(rows, epoch)`` as a single in-order list;
    micro-batches themselves are sequential, so the concatenation of
    calls is the swamp's total commit order. (Within one batch_id the
    events belong to ONE store transaction — the reference iterates
    them in unspecified map order; key ASC pins determinism.)

    Cross-TRIGGER order is enforced too: Spark's file source orders
    candidate files by millisecond-resolution mtime, so two commits
    landing in the same millisecond can be SPLIT across triggers out
    of batch order. Store batch ids are consecutive versions, so the
    deliverer buffers arrivals and flushes the contiguous prefix of a
    frontier seeded from the change log's oldest retained id (or, on
    an empty log, the store's next version — first-arrival order is
    exactly what mtime ties make unreliable); a gap that persists for
    ``gap_patience`` data-bearing triggers is skipped forward ONLY
    after re-checking the change log shows the missing ids are gone (a
    ``prune_changes`` rewrite removed them) — a gap whose ids are still
    logged is a late-but-real commit in flight and is waited on
    indefinitely, never dropped — and everything delivered
    stays strictly monotone: arrivals BELOW the frontier are DROPPED
    as duplicates (the one producer of them is a ``prune_changes``
    rewrite re-surfacing already-delivered batches as a new file).
    Because empty triggers never invoke the sink, a gap followed by a
    quiet producer can strand buffered events; after stopping the
    query call its ``strict_drain()`` attribute to flush the tail in
    order.

    Throughput tradeoff, explicitly: delivery parallelism is 1 per
    swamp and each batch is collected to the driver (bounded by
    ``max_files_per_trigger`` commit files), which is EXACTLY the
    reference's per-swamp serial-callback cost model — use it for
    consumers that need total order (audit logs, ordered replication);
    keep the default partition-parallel stream for throughput.
    Returns the StreamingQuery."""
    # seed the flush frontier from the change log's oldest retained
    # batch id — first-arrival order is exactly what mtime ties make
    # unreliable, so the initial expectation cannot come from it; an
    # EMPTY log seeds from the store's next version (batch ids ARE
    # snapshot versions), closing the same hole for a brand-new store
    first = store.changes().agg(F.min("batch_id")).first()[0]
    state = {
        "expected": int(first)
        if first is not None
        else max(0, store.version + 1),
        "buffer": {},
        "stall": 0,
    }

    def deliver(batch_df: DataFrame, epoch: int) -> None:
        rows = batch_df.orderBy(
            F.col("batch_id").asc(), F.col("key").asc()
        ).collect()
        if not rows:
            return
        buf = state["buffer"]
        for r in rows:
            buf.setdefault(int(r["batch_id"]), []).append(r)
        out: list = []
        # commits below the flush frontier are DUPLICATES (a
        # prune_changes rewrite re-surfaces delivered batches as one
        # new file) or were skipped over a pruned gap — either way
        # delivering them now would break monotonicity; drop them
        for b in [k for k in buf if k < state["expected"]]:
            buf.pop(b)
        progressed = False
        while state["expected"] in buf:
            out.extend(buf.pop(state["expected"]))
            state["expected"] += 1
            progressed = True
        if buf and not progressed and not out:
            state["stall"] += 1
            if state["stall"] >= int(gap_patience):
                # before skipping, verify the gap really is PRUNED: a
                # late-but-real commit (mtime tie/inversion splitting a
                # span across many triggers) still sits in the change
                # log and WILL be delivered — skipping past it here
                # would later drop it as a below-frontier "duplicate",
                # silent event loss in a total-order subscriber. Only a
                # batch id absent from the log (a prune_changes rewrite
                # removed it) can never arrive and is safe to skip.
                #
                # Probe cost (r11 VERDICT #6): the log files carry
                # their batch-id range in their NAMES (store._emit /
                # prune_changes), so the probe is one directory
                # listing (store.logged_in_range) — filesystem
                # metadata, no Spark job, and it cannot go stale
                # because the index IS the data file (a lost commit
                # file drops out of the listing). Only a log holding
                # legacy unnamed files (inconclusive None) falls back
                # to the old scan.
                gap_hi = min(buf)
                still_logged = store.logged_in_range(state["expected"], gap_hi)
                if still_logged is None:
                    still_logged = (
                        store.changes()
                        .filter(
                            (F.col("batch_id") >= state["expected"])
                            & (F.col("batch_id") < gap_hi)
                        )
                        .limit(1)
                        .count()
                        > 0
                    )
                if still_logged:
                    # real commit in flight — keep waiting (re-verify
                    # after every further gap_patience stalled triggers)
                    state["stall"] = 0
                else:
                    state["expected"] = gap_hi
                    while state["expected"] in buf:
                        out.extend(buf.pop(state["expected"]))
                        state["expected"] += 1
                    state["stall"] = 0
        else:
            state["stall"] = 0
        if out:
            on_events(out, int(epoch))

    def strict_drain() -> None:
        """Flush any gap-stranded buffered events in sorted order —
        call AFTER stopping the query (empty triggers never reach the
        sink, so a gap followed by a quiet producer cannot drain
        itself)."""
        buf = state["buffer"]
        out = []
        for b in sorted(buf):
            out.extend(buf.pop(b))
            state["expected"] = b + 1
        if out:
            on_events(out, -1)

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .parquet(store.changes_dir)
    )
    q = (
        stream.writeStream.outputMode("append")
        .queryName(queue_name)
        .foreachBatch(deliver)
        .start()
    )
    q.strict_drain = strict_drain
    return q


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


def windowed_event_rates(
    spark: SparkSession,
    store: TreasureStore,
    window_duration: str = "1 minute",
    slide: Optional[str] = None,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Event-time windowed mutation rates over the change stream — the
    streaming generalization of the reference's telemetry rolling stats
    (proto:2393-2458, 30-min buffer). Tumbling by default, sliding when
    ``slide`` is given; the watermark bounds state and defines how late
    an event may arrive and still be counted (the reference has no
    event-time/late-data story at all — SURVEY §2.9)."""
    ev = subscribe(spark, store).withWatermark("event_time", watermark_delay)
    win = F.window("event_time", window_duration, slide or window_duration)
    return ev.groupBy(win.alias("win"), F.col("op")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("key").alias("n_keys"),
    )


def stateful_key_activity(spark: SparkSession, store: TreasureStore) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per
    key, maintain lifetime mutation count and live/deleted status across
    micro-batches — state the built-in aggregates can't express (the
    status depends on the ORDER of ops, not their multiset).

    Arrow-batched; state is one small tuple per key, partitioned by the
    grouping key, so state size is O(live keys / executor) at scale."""
    import pandas as pd  # local import: worker-side dependency
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, alive = (state.get if state.exists else (0, True))
        last_batch = -1
        for pdf in pdfs:
            pdf = pdf.sort_values("batch_id")
            n += len(pdf)
            tail = pdf.iloc[-1]
            if tail["batch_id"] > last_batch:
                last_batch = int(tail["batch_id"])
                alive = tail["op"] != "DELETED"
        state.update((int(n), bool(alive)))
        yield pd.DataFrame(
            {"key": [key[0]], "n_mutations": [int(n)], "alive": [bool(alive)]}
        )

    return (
        subscribe(spark, store)
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType="key string, n_mutations bigint, alive boolean",
            stateStructType="n bigint, alive boolean",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "10 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Stream-STREAM interval join (click attribution): each click
    joins the SAME user's view that happened at most ``within`` before
    it — two live streams, neither side static. Both sides carry
    watermarks and the join condition bounds event-time distance, so
    Spark can expire buffered state: view-side state is held only for
    ``within`` + watermark, click-side only for the watermark — the
    contract that makes a stream-stream join runnable forever
    (unbounded-state joins are rejected by the engine outright).

    Inputs need (user_id, ts[, ...]) each; output is one row per
    attributed (view, click) pair with the attribution latency."""
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        "user_id",
        "view_ts",
        "click_ts",
        (
            F.col("click_ts").cast("double") - F.col("view_ts").cast("double")
        ).alias("latency_s"),
    )


def streaming_funnel_progress(events: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Stateful streaming funnel (the live form of
    golden/events_funnel.funnel_conversion_events): per user, track the
    furthest ORDERED step reached — a step only counts once all earlier
    steps completed, and completion times must strictly increase. Emits
    one update row per user per batch: (user_id, stage, stage_ts).

    State is one (stage, last_ts) tuple per user (applyInPandasWithState
    — O(live users / executor)); within a batch events sort by time, so
    cross-batch order only matters at the watermark granularity the
    caller configures upstream. The built-in aggregates cannot express
    this: advancement depends on the ORDER of event types, not their
    multiset."""
    import pandas as pd  # local import: worker-side dependency
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step_ix = {s: i for i, s in enumerate(steps)}

    def update(key, pdfs, state: GroupState):
        stage, last_us = (state.get if state.exists else (-1, -1))
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for _, row in pdf.iterrows():
                nxt = step_ix.get(row["event_type"])
                t_us = int(row["ts"].value // 1_000)
                if nxt == stage + 1 and t_us > last_us:
                    stage, last_us = nxt, t_us
        state.update((int(stage), int(last_us)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage": [int(stage)],
                "stage_ts_us": [int(last_us)],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, stage int, stage_ts_us bigint",
            stateStructType="stage int, last_us bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    dedup_cols: Sequence[str],
    event_time_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exact dedup over an unbounded stream with BOUNDED state — the
    streaming form of the pipeline's ``exact_dedup`` (a batch groupBy
    can't run forever; unbounded ``dropDuplicates`` state eventually
    OOMs every executor). ``dropDuplicatesWithinWatermark`` keeps one
    state row per distinct key only until the watermark passes it, so
    state is O(arrival rate x delay) regardless of corpus size — the
    only formulation that survives an endless 100 TB ingest.

    First occurrence is emitted immediately (append mode); duplicates
    arriving within the watermark horizon are suppressed. A duplicate
    arriving AFTER the horizon re-emits — by then the key's state was
    dropped; downstream periodic batch dedup (``exact_dedup`` over the
    accumulated table) reconciles the tail, the standard lambda split."""
    return stream.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(dedup_cols)
    )


def run_index_maintenance_loop(
    store: TreasureStore,
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ids_col: str = "ids",
    queue_name: str = "index_maintenance",
):
    """Incremental reverse-index maintenance: every micro-batch of new
    documents merges its (word -> doc ids) postings into the store —
    the streaming form of the reference's production write path
    (Trendizz crawls feed word->domain ``Uint32SlicePush`` swamps;
    proto:378-396 auto-dedups the set). Returns the StreamingQuery.

    Per batch: one explode+groupBy over ONLY the new documents, a
    left join against the current posting snapshot, and a set-union
    merge through ``store.set`` — so words untouched by the batch emit
    nothing, re-added ids are NOTHING_CHANGED (no event, exactly the
    reference's push semantics), and grown lists emit UPDATED change
    events to subscribers. Work per batch scales with batch size, not
    index size (the join is keyed on the batch's words only)."""

    def merge(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        from ..functions.text import tokenize

        new_post = (
            batch_df.select(
                F.col(id_col).cast("long").alias("_id"),
                F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("key"),
            )
            .groupBy("key")
            .agg(F.collect_set("_id").alias("_new_ids"))
        )
        cur = store.current().select(F.col(store.key_col).alias("key"), F.col(ids_col))
        updates = (
            new_post.join(cur, "key", "left")
            .select(
                "key",
                F.array_sort(
                    F.array_union(
                        F.coalesce(F.col(ids_col), F.array().cast("array<bigint>")),
                        F.col("_new_ids").cast("array<bigint>"),
                    )
                ).alias(ids_col),
            )
        )
        store.set(updates)

    return (
        docs_stream.writeStream.outputMode("append")
        .queryName(queue_name)
        # WriteInterval from the store's registered swamp pattern
        # governs how often postings move to the durable index
        .trigger(**trigger_for(store))
        .foreachBatch(merge)
        .start()
    )


def run_ttl_claim_loop(
    spark: SparkSession,
    store: TreasureStore,
    how_many: int,
    on_claim: Optional[Callable[[DataFrame, int], None]] = None,
    tick_seconds: Optional[int] = None,
    queue_name: str = "ttl_claims",
):
    """Continuous TTL-queue worker: every tick runs ONE serialized
    shift-expired transaction against the store and hands the claimed
    rows to ``on_claim``. Returns the StreamingQuery (caller stops it).
    ``tick_seconds`` defaults to the store's registered WriteInterval
    (``trigger_for``).

    foreachBatch gives exactly-once per tick against the store's applier;
    two loops on the same store still claim disjoint sets because each
    claim is a full snapshot-swap transaction."""

    def tick(_batch_df: DataFrame, epoch: int) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        claimed = store.shift_expired(now, how_many)
        if on_claim is not None:
            on_claim(claimed, epoch)

    trig = (
        {"processingTime": f"{int(tick_seconds)} seconds"}
        if tick_seconds is not None
        else trigger_for(store)
    )
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return (
        rate.writeStream.trigger(**trig)
        .outputMode("append")
        .queryName(queue_name)
        .foreachBatch(tick)
        .start()
    )
