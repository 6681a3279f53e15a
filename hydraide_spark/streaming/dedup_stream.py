"""Streaming per-ingest near-duplicate detection — the production form
of :func:`hydraide_spark.functions.dedup.minhash_incremental_pairs`:
that function's docstring promises "in production the right side is the
PERSISTED index this pipeline writes"; this module IS that pipeline.

A ``foreachBatch`` loop maintains two append-only parquet tables under
``state_dir`` — the banded LSH index ``bands/`` (doc_id, bucket) and
the shingle-set table ``shingles/`` (doc_id, sh, n_sh) — and appends
discovered pairs to ``pairs/``. Each micro-batch:

1. shingles + MinHash signature + band buckets for ONLY the new docs;
2. candidate join: new bands ⋈ (persisted index ∪ new bands) on the
   bucket — O(delta × collision density), the old×old cross never
   re-materializes (those pairs were found when THEIR batch arrived);
3. exact verification through the shingle table with the integer-exact
   Jaccard test (``den·inter ≥ num·union`` — no float anywhere);
4. append the new bands/shingles to the index, the pairs to ``pairs/``.

Signatures and bands are pure functions of the row, so an index built
incrementally equals one built from scratch — streamed pairs converge
to the batch pipeline's exact output
(test_store_streaming::test_neardup_ingest_loop_converges_to_batch).

**Exactly-once across retries**: each of the three tables is written
under an epoch-keyed subdirectory (``pairs/epoch=N/``, overwrite mode),
so a micro-batch that fails partway and is retried overwrites its own
partial output instead of appending duplicates; the probe explicitly
excludes the current epoch's partitions from the persisted index so a
retry after the bands write still sees the same "old" index. Epoch ids
are stable across restarts only with a checkpoint — the loop sets
``checkpointLocation`` to ``state_dir/_checkpoint`` by default.

**Commit-marker frontier (r13)**: the three tables form ONE logical
epoch, published atomically by a ``_commits/epoch=N`` marker written
AFTER all three writes (state_compact.publish_epoch_marker — the same
pattern as the unified search state). Every reader — ``ingested_pairs``,
``neardup_lookup``, and the ingest's own probes — filters to the
committed frontier, so a crash between the pairs write and the
shingles write leaves NO window where pairs are visible without their
verify rows; the epoch surfaces only when the retry re-marks it.
Pre-marker states are adopted on first post-upgrade ingest
(state_compact.adopt_unmarked_epochs) and read-everything until then.

Scale: per-batch work is bounded by the delta; the index grows by the
delta; the bucket join is an equi-join whose key cardinality scales
with the corpus (the same no-fixed-blocking rule as everything in
functions/dedup.py). At cluster scale the three dirs are tables the
stream appends to with exactly-once sinks.

Reference anchor: the reference has no near-dup operators; this is part
of the LLM-training-pipeline capability layer (SURVEY.md §6), here in
the per-ingest shape a crawl pipeline actually runs.
"""

from __future__ import annotations

import os
from fractions import Fraction
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import band_bucket_array, minhash_signature_array, shingles
from .state_compact import (
    adopt_unmarked_epochs,
    band_bucket_expr,
    committed_frontier,
    migrate_flat_state,
    pending_folded,
    publish_epoch_marker,
)

_TABLES = ("pairs", "bands", "shingles")


def _probe_epoch_cond(path: str, epoch, epochs=None):
    """The persisted-index probe filter: exclude the CURRENT epoch's
    partition (a retried epoch must probe the same "old" index the
    first attempt saw — regardless of whether its marker landed, since
    a crash can fall between the marker write and the checkpoint
    commit; ``epoch=None`` = read-only caller, nothing to exclude) AND
    any epochs a crashed compaction already folded into the base but
    did not clean up (their rows exist twice — base + epoch dir — until
    the next compaction replays the cleanup; see
    state_compact.pending_folded). coalesce(epoch, -1) keeps pre-r8
    flat legacy rows (NULL epoch) in the probe.

    ``epochs`` (r13): the committed-marker frontier — when given, only
    NEGATIVE epochs (always-committed compaction artifacts) and listed
    epochs pass, so an epoch whose tables landed but whose commit
    marker didn't stays invisible until the retry re-marks it. ``None``
    keeps the legacy read-everything behavior (pre-marker states)."""
    e = F.coalesce(F.col("epoch"), F.lit(-1))
    cond = F.lit(True) if epoch is None else e != F.lit(int(epoch))
    if epochs is not None:
        keep = [int(x) for x in epochs if int(x) >= 0]
        fc = e < 0
        if keep:
            fc = fc | e.isin(keep)
        cond = cond & fc
    pend = sorted(pending_folded(path))
    if pend:
        cond = cond & ~e.isin(pend)
    return cond


def band_buckets(
    df: DataFrame,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
) -> DataFrame:
    """(id, bucket) LSH band rows for a document frame — the pure
    per-row banding the ingest writes to the index, exposed so probes
    and harnesses can band a delta exactly the way the index was
    built (same shingles → signature → concat_ws bucket strings)."""
    assert k % bands == 0
    sh = df.select(
        F.col(id_col).cast("long").alias(id_col),
        shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    return _bands_from_shingled(sh, k, bands, id_col, engine_stable)


def _bands_from_shingled(
    sh_df: DataFrame, k: int, bands: int, id_col: str, engine_stable: bool
) -> DataFrame:
    """Signature + band bucket strings over an already-shingled frame
    (column ``sh``) — the single definition both the ingest and
    :func:`band_buckets` use, so a probe's banding can never drift from
    the index's."""
    sig = sh_df.select(
        F.col(id_col),
        minhash_signature_array(F.col("sh"), k, engine_stable=engine_stable).alias(
            "_sig"
        ),
    )
    return sig.select(
        F.col(id_col),
        F.explode(band_bucket_array(F.col("_sig"), k, bands)).alias("bucket"),
    )


def hashed_probe_frame(
    spark: SparkSession,
    table_dir: str,
    schema: str,
    keys_df: DataFrame,
    key_col: str,
    epoch: int,
    epochs=None,
):
    """A hash-bucketed state table restricted to what a delta probe can
    possibly match — the read side of the bucketed-base layout
    (state_compact.compact_hashed_epochs):

    - Flat delta epoch dirs (everything the last compaction left live)
      are read in full — their total size is bounded by the deltas
      since that compaction, not the corpus.
    - The bucket-partitioned base is PRUNED to the directories the
      probe's own keys (``keys_df[key_col]``) hash into (``bkt IN
      (touched)``, a literal list — directory-level pruning, never a
      row scan of the base; the collect is bounded by n_buckets
      ≤ 65536, never by the corpus). The pruned fraction is
      ~min(1, probe_keys / n_buckets), and compaction scales n_buckets
      with the corpus, so probe IO stays O(delta) as the index grows —
      the fix for the O(index) band/shingle scans (r9 VERDICT,
      BENCH_stream_scale minhash ingest b=0.10).

    A pre-bucketing flat base (no ``_NBUCKETS`` manifest) is read in
    full like a delta dir — legacy behavior until the next compaction
    rewrites it. Returns None when no index exists yet. Own-epoch,
    uncommitted (``epochs`` frontier) and folded-but-uncleaned epochs
    are excluded (``_probe_epoch_cond``); the bucketed base is part of
    every frontier. ``schema`` is the table's DATA schema (no
    epoch/bkt columns)."""
    from .state_compact import split_bucketed_table

    nb, flat, base = split_bucketed_table(spark, table_dir, schema)
    frames = []
    if flat is not None:
        frames.append(
            flat.filter(_probe_epoch_cond(table_dir, epoch, epochs)).drop("epoch")
        )
    if base is not None:
        touched = sorted(
            r["b"]
            for r in keys_df.select(
                band_bucket_expr(F.col(key_col), nb).alias("b")
            )
            .distinct()
            .collect()
        )
        frames.append(base.filter(F.col("bkt").isin(touched)).drop("bkt"))
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def bands_probe_frame(
    spark: SparkSession,
    bands_dir: str,
    delta_banded: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    epochs=None,
):
    """The band index's :func:`hashed_probe_frame`: pruned to the
    directories the delta's own bucket strings hash into."""
    return hashed_probe_frame(
        spark,
        bands_dir,
        f"{id_col} long, bucket string",
        delta_banded,
        "bucket",
        epoch,
        epochs=epochs,
    )


def make_ingest(
    spark: SparkSession,
    state_dir: str,
    tau: float,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
    timings: Optional[list] = None,
    publish: bool = True,
):
    """Build the per-micro-batch ingest function (exposed so tests can
    replay an epoch and assert the overwrite-idempotence contract
    directly). ``publish=False`` suppresses the commit marker — for a
    COMBINED ingest (the r13 unified admission state) that writes more
    tables under the same epoch and publishes once after all of them.

    ``timings``: pass a list and every ingest call appends
    ``{"epoch", "probe_bands", "candidates", "verify_write",
    "band_write", "shingle_write", "total"}`` wall seconds — the
    per-phase split along the batch's ACTION boundaries (r10 VERDICT
    #1: an aggregate per-epoch wall can't say whether drift is the
    probe, the verify join, or the index writes). probe_bands covers
    shingling+banding+persist of the delta plus the band-index probe
    setup (its touched-bucket collect is the first job); candidates
    covers the band self-join (forced by the shingle probe's
    touched-bucket collect); with no bucketed base yet, those collects
    don't run and the work shifts into verify_write — phase zeros
    before the first compaction are expected."""
    import time as _time

    assert k % bands == 0
    frac = Fraction(tau).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    bands_dir = os.path.join(state_dir, "bands")
    sh_dir = os.path.join(state_dir, "shingles")
    pairs_dir = os.path.join(state_dir, "pairs")
    sh_schema = f"{id_col} long, sh array<string>, n_sh int"
    def ingest(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        # pre-r8 state dirs are flat (append mode): fold their root-
        # level files into the epoch=-1 base BEFORE this epoch's subdir
        # lands — Spark partition discovery silently drops root files
        # in a mixed layout, which would vanish the whole legacy index
        # from probes. Per-batch cost is one listdir per table.
        for d in (bands_dir, sh_dir, pairs_dir):
            migrate_flat_state(d)
        # pre-r13 states published epochs by the table writes alone:
        # mark those epochs committed ONCE so the marker frontier below
        # doesn't vanish them (no-op when _commits already exists)
        adopt_unmarked_epochs(state_dir, _TABLES)
        frontier = committed_frontier(state_dir)
        _t0 = _time.perf_counter()
        _rec = {"epoch": int(epoch)}
        sh_new = (
            batch_df.select(
                F.col(id_col).cast("long").alias(id_col),
                shingles(F.col(text_col), n).alias("sh"),
            )
            .withColumn("n_sh", F.size("sh"))
            .filter(F.col("n_sh") > 0)
            .persist()
        )
        new_banded = _bands_from_shingled(
            sh_new, k, bands, id_col, engine_stable
        ).persist()

        # pruned persisted-index probe: flat delta epochs in full (size
        # bounded by deltas since last compaction), the bucket-
        # partitioned base only where this delta's buckets hash
        # (directory pruning — see bands_probe_frame). Own-epoch and
        # folded-but-uncleaned epochs excluded inside.
        old_banded = bands_probe_frame(
            spark, bands_dir, new_banded, epoch, id_col=id_col, epochs=frontier
        )
        _t1 = _time.perf_counter()
        _rec["probe_bands"] = _t1 - _t0
        all_banded = (
            new_banded
            if old_banded is None
            else new_banded.unionByName(old_banded)
        )
        a, b_ = new_banded.alias("a"), all_banded.alias("b")
        cand = (
            a.join(
                b_,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(
                F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
                F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            )
            .distinct()
            .persist()
        )
        # the shingle (verify) table prunes to the CANDIDATE ids'
        # buckets — the verify join only ever needs rows for pair
        # members, and the touched-bucket collect (bounded by
        # n_buckets) forces cand once, which the persisted frame
        # then serves to the verify join below
        partners = cand.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        )
        old_sizes = hashed_probe_frame(
            spark, sh_dir, sh_schema, partners, id_col, epoch, epochs=frontier
        )
        _t2 = _time.perf_counter()
        _rec["candidates"] = _t2 - _t1
        all_sizes = (
            sh_new if old_sizes is None else sh_new.unionByName(old_sizes)
        )
        pa = all_sizes.select(
            F.col(id_col).alias("id_a"),
            F.col("sh").alias("sh_a"),
            F.col("n_sh").alias("n_a"),
        )
        pb = all_sizes.select(
            F.col(id_col).alias("id_b"),
            F.col("sh").alias("sh_b"),
            F.col("n_sh").alias("n_b"),
        )
        verified = (
            cand.join(pa, "id_a")
            .join(pb, "id_b")
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("union", F.col("n_a") + F.col("n_b") - F.col("inter"))
            .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("union"))
            .select("id_a", "id_b", "inter", "union")
        )
        # epoch-keyed overwrite = idempotent per epoch: a retried
        # micro-batch replaces its own partial output, never appends a
        # second copy (advice r7: three independent appends were not
        # retry-safe)
        ep = f"epoch={int(epoch)}"
        verified.write.mode("overwrite").parquet(os.path.join(pairs_dir, ep))
        _t3 = _time.perf_counter()
        _rec["verify_write"] = _t3 - _t2
        new_banded.write.mode("overwrite").parquet(os.path.join(bands_dir, ep))
        _t4 = _time.perf_counter()
        _rec["band_write"] = _t4 - _t3
        sh_new.select(id_col, "sh", "n_sh").write.mode("overwrite").parquet(
            os.path.join(sh_dir, ep)
        )
        # marker LAST: the atomic publish point — readers filtering to
        # the committed frontier never see an epoch whose pairs landed
        # but whose bands/shingles didn't (r11 invariant, retrofitted
        # here in r13; the unified search state had it from the start)
        if publish:
            publish_epoch_marker(state_dir, epoch)
        _t5 = _time.perf_counter()
        _rec["shingle_write"] = _t5 - _t4
        _rec["total"] = _t5 - _t0
        if timings is not None:
            timings.append({k_: round(v, 4) if isinstance(v, float) else v
                            for k_, v in _rec.items()})
        sh_new.unpersist()
        new_banded.unpersist()
        cand.unpersist()

    return ingest


def run_neardup_ingest_loop(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    tau: float,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
    queue_name: str = "neardup_ingest",
    checkpoint_dir: Optional[str] = None,
):
    """Start the per-ingest near-dup stream; returns the
    StreamingQuery. ``docs_stream`` must deliver each doc_id once
    (re-ingested ids would re-pair against themselves).
    ``checkpoint_dir`` defaults to ``state_dir/_checkpoint`` — pass
    the same one across restarts so retried epochs keep their ids and
    the epoch-keyed overwrites stay idempotent."""
    ingest = make_ingest(
        spark,
        state_dir,
        tau,
        n=n,
        k=k,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
        engine_stable=engine_stable,
    )
    return (
        docs_stream.writeStream.outputMode("append")
        .queryName(queue_name)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(state_dir, "_checkpoint"),
        )
        .foreachBatch(ingest)
        .start()
    )


def make_chunk_ingest(
    spark: SparkSession,
    state_dir: str,
    tau: float,
    chunk_size: int,
    overlap: int = 0,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
    timings: Optional[list] = None,
):
    """Chunk-granularity streaming near-dup ingest (r13 — r12 VERDICT
    missing #3): each micro-batch's documents EXPLODE into packed
    (doc·2^20+chunk) token-window chunks inside the batch
    (functions.dedup.packed_chunk_frame — the same single definition
    the batch operator uses, so incremental banding can never drift
    from batch), then run through the ordinary near-dup ingest with
    the packed key as the id. The crawl admission check at passage
    granularity: a page sharing one boilerplate paragraph with an
    earlier page pairs on arrival even when whole-doc Jaccard dilutes
    the overlap away (the Lee et al. case)."""
    from ..functions.dedup import packed_chunk_frame

    inner = make_ingest(
        spark,
        state_dir,
        tau,
        n=n,
        k=k,
        bands=bands,
        id_col="_ck",
        text_col="chunk_text",
        engine_stable=engine_stable,
        timings=timings,
    )

    def ingest(batch_df: DataFrame, epoch: int) -> None:
        inner(
            packed_chunk_frame(batch_df, chunk_size, overlap, id_col, text_col),
            epoch,
        )

    return ingest


def run_chunk_neardup_ingest_loop(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    tau: float,
    chunk_size: int,
    overlap: int = 0,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
    queue_name: str = "chunk_neardup_ingest",
    checkpoint_dir: Optional[str] = None,
):
    """Start the chunk-granularity near-dup stream; same contracts as
    :func:`run_neardup_ingest_loop` (each doc_id delivered once, stable
    checkpoint across restarts, epoch-keyed overwrites + the r13
    commit-marker frontier)."""
    ingest = make_chunk_ingest(
        spark, state_dir, tau, chunk_size, overlap=overlap,
        n=n, k=k, bands=bands, id_col=id_col, text_col=text_col,
        engine_stable=engine_stable,
    )
    return (
        docs_stream.writeStream.outputMode("append")
        .queryName(queue_name)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(state_dir, "_checkpoint"),
        )
        .foreachBatch(ingest)
        .start()
    )


def chunk_ingested_pairs(
    spark: SparkSession, state_dir: str, cross_doc_only: bool = True
) -> DataFrame:
    """The accumulated chunk-pair table in (doc, chunk) coordinates —
    :func:`ingested_pairs` with the packed keys decoded. Converges to
    the batch ``chunk_neardup_pairs(collapse_exact=False)`` output once
    the stream has delivered every document. ``cross_doc_only`` drops
    within-doc pairs (self-repetition is repetition_signals' job, same
    default as batch)."""
    from ..functions.dedup import unpacked_chunk_cols

    pairs = ingested_pairs(spark, state_dir)
    out = pairs.select(
        *unpacked_chunk_cols("id_a", "doc_a", "chunk_a"),
        *unpacked_chunk_cols("id_b", "doc_b", "chunk_b"),
        "inter",
        "union",
    )
    if cross_doc_only:
        out = out.filter(F.col("doc_a") != F.col("doc_b"))
    return out


def chunk_neardup_lookup(
    spark: SparkSession,
    state_dir: str,
    query_docs: DataFrame,
    tau: float,
    chunk_size: int,
    overlap: int = 0,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
) -> DataFrame:
    """Passage-granularity serving probe WITHOUT ingesting: chunk the
    query documents exactly like the index was built, look each packed
    chunk up against the persisted chunk index
    (:func:`neardup_lookup`), and decode both sides. Returns one row
    per (query chunk, persisted near-dup chunk):
    (doc_id, chunk_id, match_doc, match_chunk, inter, union) — the
    admission check "does ANY passage of this page duplicate something
    we already hold?". Cost is O(query chunks + matching index rows),
    same pruned reads as the doc-level lookup."""
    from ..functions.dedup import packed_chunk_frame, unpacked_chunk_cols

    chunked = packed_chunk_frame(
        query_docs, chunk_size, overlap, id_col, text_col
    )
    hits = neardup_lookup(
        spark,
        state_dir,
        chunked,
        tau,
        n=n,
        k=k,
        bands=bands,
        id_col="_ck",
        text_col="chunk_text",
        engine_stable=engine_stable,
    )
    return hits.select(
        *unpacked_chunk_cols("_ck", id_col, "chunk_id"),
        *unpacked_chunk_cols("match_id", "match_doc", "match_chunk"),
        "inter",
        "union",
    )


def ingested_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated pair table the loop has discovered so far —
    empty (not an error) before the first non-empty micro-batch has
    created the table. DISTINCT on read: the loop's contract is each
    doc_id delivered once, but an at-least-once upstream that
    re-delivers a doc re-pairs it against its own earlier bands and
    lands the same (id_a, id_b, inter, union) row in a second epoch —
    the integer Jaccard stats of a duplicate pair are identical, so
    the distinct collapses re-delivery artifacts without touching real
    pairs (cost: one aggregate over the pair table, which is
    output-sized, not corpus-sized)."""
    schema = "id_a long, id_b long, inter int, union int"
    path = os.path.join(state_dir, "pairs")
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    migrate_flat_state(path)  # pre-r8 flat layout → epoch=-1 base
    from .search_stream import _epoch_filtered

    # committed-marker frontier (r13): an epoch whose pairs landed but
    # whose marker didn't (crash mid-batch) stays invisible until the
    # retry re-marks it; None = pre-marker legacy state, read all
    return _epoch_filtered(
        spark.read.schema(schema + ", epoch long").parquet(path),
        committed_frontier(state_dir),
        path,
    ).distinct()


def neardup_lookup(
    spark: SparkSession,
    state_dir: str,
    query_docs: DataFrame,
    tau: float,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine_stable: bool = False,
) -> DataFrame:
    """Read-only near-dup POINT LOOKUP against the persisted index —
    the serving question "is this document a near-dup of anything we
    already have?" without ingesting it (the crawl-dedup admission
    check; the write path is :func:`make_ingest`).

    Same arithmetic as the ingest, so a doc that WOULD pair on ingest
    pairs here: identical shingles → signature → banding
    (:func:`_bands_from_shingled`), identical integer-exact Jaccard
    (den·inter ≥ num·union). Same pruned reads, so the cost is
    O(query + matching index rows), not O(index): the band probe
    touches only the query docs' bucket directories of the bucketed
    base, and the shingle read only the candidate partner ids'
    directories. Nothing is written, no epoch is excluded
    (``epoch=None`` — a reader has no own-epoch), and crashed-
    compaction duplicates stay excluded like every other reader.

    Returns (query id under ``id_col``, match_id, inter, union) — one
    row per (query doc, persisted near-dup). Query ids never pair with
    themselves, so looking up an already-ingested doc returns its
    OTHER near-dups. The result is MATERIALIZED (a lookup's output is
    request-sized by construction) so the internal persists release
    deterministically before returning."""
    assert k % bands == 0
    frac = Fraction(tau).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    bands_dir = os.path.join(state_dir, "bands")
    sh_dir = os.path.join(state_dir, "shingles")

    sh_q = (
        query_docs.select(
            F.col(id_col).cast("long").alias(id_col),
            shingles(F.col(text_col), n).alias("sh"),
        )
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
        .persist()
    )
    banded_q = _bands_from_shingled(sh_q, k, bands, id_col, engine_stable)
    frontier = committed_frontier(state_dir)
    idx = bands_probe_frame(
        spark, bands_dir, banded_q, epoch=None, id_col=id_col, epochs=frontier
    )
    empty = spark.createDataFrame(
        [], f"{id_col} long, match_id long, inter int, union int"
    )
    if idx is None:
        sh_q.unpersist()
        return empty
    cand = (
        banded_q.alias("q")
        .join(
            idx.alias("i"),
            (F.col("q.bucket") == F.col("i.bucket"))
            & (F.col(f"q.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias(id_col),
            F.col(f"i.{id_col}").alias("match_id"),
        )
        .distinct()
        .persist()
    )
    old_sizes = hashed_probe_frame(
        spark,
        sh_dir,
        f"{id_col} long, sh array<string>, n_sh int",
        cand.select(F.col("match_id").alias(id_col)),
        id_col,
        epoch=None,
        epochs=frontier,
    )
    if old_sizes is None:
        sh_q.unpersist()
        cand.unpersist()
        return empty
    # an at-least-once upstream that re-delivered a doc left its
    # identical shingle row in several epochs — keep one per id so the
    # verify join cannot fan a match out into duplicate result rows
    old_sizes = old_sizes.dropDuplicates([id_col])
    out = (
        cand.join(
            sh_q.select(id_col, F.col("sh").alias("sh_q"), F.col("n_sh").alias("n_q")),
            id_col,
        )
        .join(
            old_sizes.select(
                F.col(id_col).alias("match_id"),
                F.col("sh").alias("sh_m"),
                F.col("n_sh").alias("n_m"),
            ),
            "match_id",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_q", "sh_m")))
        .withColumn("union", F.col("n_q") + F.col("n_m") - F.col("inter"))
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("union"))
        .select(id_col, "match_id", "inter", "union")
    )
    rows = out.collect()
    sh_q.unpersist()
    cand.unpersist()
    if not rows:
        return empty
    return spark.createDataFrame(rows, out.schema)
