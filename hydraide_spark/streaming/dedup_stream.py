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

from ..functions.dedup import minhash_signature, shingles
from .state_compact import migrate_flat_state, pending_folded


def _probe_epoch_cond(path: str, epoch: int):
    """The persisted-index probe filter: exclude the CURRENT epoch's
    partition (a retried epoch must probe the same "old" index the
    first attempt saw) AND any epochs a crashed compaction already
    folded into the base but did not clean up (their rows exist twice —
    base + epoch dir — until the next compaction replays the cleanup;
    see state_compact.pending_folded). coalesce(epoch, -1) keeps
    pre-r8 flat legacy rows (NULL epoch) in the probe."""
    e = F.coalesce(F.col("epoch"), F.lit(-1))
    cond = e != F.lit(int(epoch))
    pend = sorted(pending_folded(path))
    if pend:
        cond = cond & ~e.isin(pend)
    return cond


def _read_or_none(spark: SparkSession, path: str, schema: str):
    try:
        if not os.path.exists(path):
            return None
        return spark.read.schema(schema).parquet(path)
    except Exception:
        return None


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
):
    """Build the per-micro-batch ingest function (exposed so tests can
    replay an epoch and assert the overwrite-idempotence contract
    directly)."""
    assert k % bands == 0
    rows_per_band = k // bands
    frac = Fraction(tau).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    bands_dir = os.path.join(state_dir, "bands")
    sh_dir = os.path.join(state_dir, "shingles")
    pairs_dir = os.path.join(state_dir, "pairs")
    bands_schema = f"{id_col} long, bucket string"
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
        sh_new = (
            batch_df.select(
                F.col(id_col).cast("long").alias(id_col),
                shingles(F.col(text_col), n).alias("sh"),
            )
            .withColumn("n_sh", F.size("sh"))
            .filter(F.col("n_sh") > 0)
            .persist()
        )
        sig = sh_new.select(
            F.col(id_col),
            *minhash_signature(F.col("sh"), k, engine_stable=engine_stable),
        )
        band_cols = [
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
            ).alias(f"band{b}")
            for b in range(bands)
        ]
        new_banded = sig.select(
            F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
        ).persist()

        # probe filter (_probe_epoch_cond): own-epoch exclusion for
        # retry idempotence + folded-but-uncleaned epoch exclusion for
        # crashed-compaction consistency; coalesce(epoch, -1) keeps
        # pre-r8 flat legacy rows (NULL epoch) in the probe — -1 is the
        # compaction base id, never a live epoch.
        old_banded = _read_or_none(
            spark, bands_dir, bands_schema + ", epoch long"
        )
        if old_banded is not None:
            old_banded = old_banded.filter(
                _probe_epoch_cond(bands_dir, epoch)
            ).drop("epoch")
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
        )
        old_sizes = _read_or_none(spark, sh_dir, sh_schema + ", epoch long")
        if old_sizes is not None:
            old_sizes = old_sizes.filter(
                _probe_epoch_cond(sh_dir, epoch)
            ).drop("epoch")
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
        new_banded.write.mode("overwrite").parquet(os.path.join(bands_dir, ep))
        sh_new.select(id_col, "sh", "n_sh").write.mode("overwrite").parquet(
            os.path.join(sh_dir, ep)
        )
        sh_new.unpersist()
        new_banded.unpersist()

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


def ingested_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated pair table the loop has discovered so far —
    empty (not an error) before the first non-empty micro-batch has
    created the table."""
    schema = "id_a long, id_b long, inter int, union int"
    path = os.path.join(state_dir, "pairs")
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    migrate_flat_state(path)  # pre-r8 flat layout → epoch=-1 base
    from .search_stream import _epoch_filtered

    return _epoch_filtered(
        spark.read.schema(schema + ", epoch long").parquet(path), None, path
    )
