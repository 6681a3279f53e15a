"""Streaming SEARCH index maintenance — the tf-bearing incremental
postings layer that lets the whole hybrid-retrieval stack
(functions/retrieval.py) run against PERSISTED, incrementally-built
state instead of a batch corpus scan:

- :func:`run_postings_ingest_loop` maintains two tables under
  ``state_dir``: ``postings/`` (word, doc_id, tf) and ``doclen/``
  (doc_id, dl), written per micro-batch as epoch-keyed overwrites
  (the r8 exactly-once sink contract shared with dedup_stream /
  ann_stream — retried epochs replace their own partial output).
  Unlike the id-list reverse index (streaming/subscribe.py
  run_index_maintenance_loop — the reference's Uint32Slice posting
  swamps), these postings carry TERM FREQUENCY, which ranked
  retrieval (BM25) needs.
- :func:`bm25_from_state` scores a bag-of-words query over the
  persisted index with EXACTLY the arithmetic of
  ``functions/text.py::bm25_terms`` (same idf/tf-norm expression tree,
  same DECIMAL(28,6) term rounding), so once every document has been
  ingested the incremental scores equal the batch operator's
  bit-for-bit (test_store_streaming::
  test_streaming_postings_bm25_converges_to_batch).

Postings and doc lengths are pure per-document functions, so the
index is ingestion-order independent; corpus statistics (N, avgdl)
are computed from the doclen table at query time — they see exactly
the ingested corpus.

Scale: per-batch work is the delta's explode + one grouped count; the
query-time read filters postings to the query words (parquet
column-statistics pushdown on ``word`` — postings stay hash-friendly
long-form, never array-per-word cells, see text.py::postings). The
epoch dirs compact with streaming/state_compact.py like the other
state tables.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import postings, token_count


def make_postings_ingest(
    spark: SparkSession,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Build the per-micro-batch ingest function (exposed for tests to
    replay an epoch and assert overwrite idempotence)."""
    post_dir = os.path.join(state_dir, "postings")
    dl_dir = os.path.join(state_dir, "doclen")

    def ingest(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        ep = f"epoch={int(epoch)}"
        batch = batch_df.select(
            F.col(id_col).cast("long").alias(id_col), F.col(text_col)
        ).persist()
        post = postings(batch, id_col, text_col).select(
            "word", F.col(id_col), F.col("tf").cast("long").alias("tf")
        )
        post.write.mode("overwrite").parquet(os.path.join(post_dir, ep))
        dl = batch.select(
            F.col(id_col), token_count(F.col(text_col)).alias("dl")
        )
        dl.write.mode("overwrite").parquet(os.path.join(dl_dir, ep))
        batch.unpersist()

    return ingest


def run_postings_ingest_loop(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    queue_name: str = "postings_ingest",
    checkpoint_dir: Optional[str] = None,
):
    """Start the incremental postings stream; returns the
    StreamingQuery. ``docs_stream`` must deliver each doc once."""
    ingest = make_postings_ingest(
        spark, state_dir, id_col=id_col, text_col=text_col
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


def persisted_postings(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    schema = f"word string, {id_col} long, tf long, epoch long"
    path = os.path.join(state_dir, "postings")
    if not os.path.exists(path):
        return spark.createDataFrame([], schema).drop("epoch")
    return spark.read.schema(schema).parquet(path).drop("epoch")


def persisted_doclen(
    spark: SparkSession, state_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    schema = f"{id_col} long, dl int, epoch long"
    path = os.path.join(state_dir, "doclen")
    if not os.path.exists(path):
        return spark.createDataFrame([], schema).drop("epoch")
    return spark.read.schema(schema).parquet(path).drop("epoch")


def bm25_from_state(
    spark: SparkSession,
    state_dir: str,
    query_words: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, word) BM25 term scores for a bag-of-words query over
    the PERSISTED index — the same expression tree and DECIMAL(28,6)
    term rounding as the batch ``bm25_terms``, with corpus stats
    (N, avgdl) from the doclen table. Once the stream has delivered
    every document, the output equals the batch operator bit-for-bit.
    Sum per doc downstream exactly like the batch path."""
    from ..functions._cache import pin_latest

    dl = persisted_doclen(spark, state_dir, id_col=id_col).persist()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    post = (
        persisted_postings(spark, state_dir, id_col=id_col)
        .filter(F.col("word").isin(list(query_words)))
        .persist()
    )
    pin_latest("search_stream.bm25_from_state", dl, post)
    dfreq = post.groupBy("word").agg(F.count(F.lit(1)).alias("dfreq"))
    joined = (
        post.join(F.broadcast(dfreq), "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return joined.select(
        F.col(id_col),
        F.col("word"),
        F.round(idf * tf_norm, 6).cast("decimal(28,6)").alias("term_score"),
    )


def hybrid_search_from_state(
    spark: SparkSession,
    search_state_dir: str,
    ivf_state_dir: str,
    query_words: Sequence[str],
    queries: DataFrame,
    centroids: Sequence[Sequence[float]],
    topk_per_side: int = 50,
    nprobe: int = 2,
    k0: int = 60,
    topk: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """One-call hybrid retrieval over PERSISTED incremental state: BM25
    from the postings index, dense from the IVF cell index (single
    query — ``queries`` must carry one row with (query_id, query_vec)),
    fused by RRF. Equals the batch-operator composition once every
    document/vector has been ingested (convergence pinned in
    test_store_streaming::test_streaming_postings_bm25_converges_to_batch)."""
    from ..functions.retrieval import ranked_list, rrf_fuse
    from .ann_stream import ivf_query_persisted

    lex_scored = (
        bm25_from_state(spark, search_state_dir, query_words, id_col=id_col)
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("score"))
    )
    lex = ranked_list(lex_scored, id_col, "score", topk=topk_per_side)
    dense_topk = ivf_query_persisted(
        spark,
        ivf_state_dir,
        queries,
        k=topk_per_side,
        centroids=centroids,
        nprobe=nprobe,
    )
    dense = ranked_list(
        dense_topk.select(F.col("vec_id").alias(id_col), "score"),
        id_col,
        "score",
        topk=topk_per_side,
    )
    return rrf_fuse([lex, dense], id_col=id_col, k0=k0, topk=topk)
