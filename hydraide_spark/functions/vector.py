"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how the reference positions vector filtering
(scalar pre-filter first, then scan — reference
``proto/hydraide.proto:2678-2687``):

- ``cosine_topk``: brute-force exact top-k. The query set is broadcast
  (it is small by construction); every partition scores its rows
  independently and a per-query window keeps k — one narrow shuffle of
  k*queries rows. This is the correctness baseline at any scale.
- ``lsh_topk`` / ``lsh_bucket_expr``: random-hyperplane LSH. Plane
  matrix is generated driver-side from a fixed seed, embedded as a
  literal (tiny), bucket id computed as a sign-bit string — candidates
  co-group by bucket so the join prunes to ~1/2^bits of the corpus;
  re-rank exactly within candidates. This is the 100 TB path: bucket id
  is a partition key, so the expensive exact scoring never crosses
  buckets.

Scoring stays in JVM higher-order functions by default;
``pandas_cosine_scores`` is the Arrow/numpy batch alternative for very
high dimensions (BLAS beats codegen'd fold at d >~ 1k).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..query.filters import cosine_similarity, dot_product, l2_norm


def _as_double_array(vs: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vs]).cast("array<double>")


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the query set, score every
    (row, query) pair, keep k per query. Deterministic tiebreak on id."""
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_qv")
    )
    scored = df.join(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col("_qv")).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def lsh_bucket_expr(vec_col: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bit bucket id for random-hyperplane LSH: one char per plane,
    '1' if dot(v, plane) >= 0. Pure column expression."""
    bits = [
        F.when(dot_product(vec_col, _as_double_array(p)) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def make_planes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (fixed-seed normal draws, driver-side)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).tolist()


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank within candidates. Equi-join on bucket id means
    the corpus can be bucketed/partitioned once and reused across query
    batches — no full-corpus scan per query."""
    planes = make_planes(dim, n_bits, seed)
    corpus = df.withColumn("_bucket", lsh_bucket_expr(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_bucket", lsh_bucket_expr(F.col("_qv"), planes))
    cand = corpus.join(F.broadcast(q), "_bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col("_qv")).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def pandas_cosine_scores(query: Sequence[float]):
    """Arrow-batched numpy cosine scorer — the slow-path alternative for
    very high-dimensional vectors. Returns a pandas_udf usable as
    ``df.select(scorer(F.col('embedding')))``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(qv)

    @pandas_udf("double")
    def scorer(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        norms = np.linalg.norm(M, axis=1)
        return pd.Series((M @ qv) / (norms * qn))

    return scorer
