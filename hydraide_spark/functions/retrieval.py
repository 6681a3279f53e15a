"""Hybrid retrieval: reciprocal-rank fusion (RRF) of independently
ranked result lists — the standard way to combine a lexical (BM25 /
posting-list) ranking with a dense (embedding cosine) ranking without
calibrating their score scales (Cormack, Clarke & Büttcher, SIGIR'09:
``RRF(d) = Σ_lists 1/(k0 + rank_list(d))``, k0=60).

Reference anchor: the reference's search surface is the AND-only
posting-list lookup behind Trendizz (README "2M+ websites indexed",
reverse-index build in SURVEY.md §2.3); the engine already upgrades
that to ranked BM25 (`functions/text.py::bm25_terms`) and dense ANN
(`functions/vector.py::cosine_topk` + LSH/IVF/PQ scale paths). RRF is
the fusion layer a real retrieval stack puts on top — part of the
beyond-parity LLM-pipeline capability layer (SURVEY.md §6).

Scale: each input is a per-query TOP-K list (bounded rows, k ≪ corpus),
so the fusion join is broadcast-sized no matter how big the corpus is;
the expensive parts (BM25 postings, ANN candidate generation) keep
their own blocked/bucketed plans. Nothing here touches the corpus.

Float exactness (for the DuckDB oracle): 1/(k0+rank) is one correctly-
rounded IEEE division of exact integers, and the fused score adds the
per-list contributions in LIST ORDER (left fold) — bit-identical in
any engine that replays the same order, no rounding needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def ranked_list(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    topk: int,
    ascending: bool = False,
) -> DataFrame:
    """(id, score) -> (id, rank) with rank 1..topk, deterministic
    tiebreak on id ASC. One window over the scored frame — at scale
    this is per-query top-k (use a partitionBy variant upstream for
    multi-query batches)."""
    order = (
        F.col(score_col).asc() if ascending else F.col(score_col).desc()
    )
    w = W.orderBy(order, F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(id_col, "rank")
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    topk: Optional[int] = None,
) -> DataFrame:
    """Fuse ranked lists — each a frame with (id_col, rank) where rank
    is 1-based — into ``(id_col, rank_0..rank_{n-1}, rrf)``. A doc
    missing from a list contributes 0 for that list. ``topk`` keeps the
    best fused rows (tiebreak id ASC)."""
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    out = None
    for i, r in enumerate(ranked):
        ri = r.select(
            F.col(id_col), F.col("rank").cast("long").alias(f"rank_{i}")
        )
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = None
    for i in range(len(ranked)):
        contrib = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{i}")),
        ).otherwise(F.lit(0.0))
        score = contrib if score is None else score + contrib
    out = out.select(
        id_col,
        *[F.col(f"rank_{i}") for i in range(len(ranked))],
        score.alias("rrf"),
    )
    if topk is not None:
        w = W.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= topk)
            .drop("_rn")
        )
    return out
