"""Int8 scalar quantization: code correctness by hand, recall of the
integer-dot ranking against the exact float-cosine top-k, and the
quantized-corpus storage form."""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.vector import (
    cosine_topk,
    int8_quantize,
    int8_topk,
)
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_quantize_codes_by_hand(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.4, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in int8_quantize(df).collect()}
    # scale = 0.5; q = floor(x*127/0.5 + 0.5) = [127, floor(-101.1)= -102, 0]
    assert rows[1]["scale"] == 0.5
    assert rows[1]["q"] == [127, -102, 0]
    # all-zero vector: scale 0, all-zero codes (no division by zero)
    assert rows[2]["scale"] == 0.0
    assert rows[2]["q"] == [0, 0, 0]


def test_int8_ranking_recall_vs_exact_cosine(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    exact = cosine_topk(emb, queries, k=k)
    got = int8_topk(emb, queries, k=k)
    exact_sets: dict = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / k for q in exact_sets
    ]
    # int8 max-abs keeps direction to ~1/254 per component — top-10
    # overlap with the float ranking stays high
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_est_cos_tracks_float_cosine(spark):
    from hydraide_spark.query.filters import cosine_similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = int8_topk(emb, queries, k=5)
    qv = queries.head()["query_vec"]
    true = emb.select(
        "vec_id",
        cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(float(x)) for x in qv]).cast("array<double>"),
        ).alias("cos"),
    )
    joined = {r["vec_id"]: r for r in got.join(true, "vec_id").collect()}
    for r in joined.values():
        assert abs(r["est_cos"] - r["cos"]) < 0.02  # quantization error bound


def test_ivf_int8_recall_vs_exact_cosine(spark):
    from hydraide_spark.functions.vector import ivf_int8_topk, train_ivf_centroids

    emb = load_table(spark, SF, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    exact_sets: dict = {}
    for r in cosine_topk(emb, queries, k=k).collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict = {}
    for r in ivf_int8_topk(emb, queries, k=k, centroids=cents, nprobe=2).collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / k for q in exact_sets
    ]
    # two stacked approximations (2/8-cell probe + int8) — floor is the
    # IVF recall floor, quantization barely moves it
    assert sum(recalls) / len(recalls) >= 0.5, recalls


import pytest as _pytest


@_pytest.mark.parametrize("sf_dir", [SF, "/root/testdata/sf0.01"])
def test_int8_neardup_agrees_with_float_verify(spark, sf_dir):
    """embedding_neardup_pairs_int8 must find (nearly) the same pair
    set as the float verify under IDENTICAL blocking: quantization
    moves the cosine by < ~0.02, so with a margin band around tau the
    sets match exactly; overall Jaccard agreement stays high. Runs at
    sf0.001 AND sf0.01 (r10 memory note: the floor should hold as the
    corpus — and the per-label blocks — grow 10×)."""
    from hydraide_spark.functions.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    jit = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.col("label"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), (x, i) -> "
            "x * (1.0D + CAST((vec_id + i) % 7 - 3 AS DOUBLE) * 0.001D))"
        ).alias("embedding"),
    )
    corpus = base.unionByName(jit)
    kw = dict(block_col="label", auto_bucket_target=64, dim=64, seed=42)
    fl = embedding_neardup_pairs(corpus, tau=0.95, **kw)
    i8 = embedding_neardup_pairs_int8(corpus, tau=0.95, **kw)
    fset = {(r["id_a"], r["id_b"]): r["score"] for r in fl.collect()}
    iset = {(r["id_a"], r["id_b"]): r["est_cos"] for r in i8.collect()}
    assert fset and iset
    inter = set(fset) & set(iset)
    jacc = len(inter) / len(set(fset) | set(iset))
    assert jacc >= 0.9, jacc
    # disagreements only live in the quantization band around tau
    for pair in set(fset) ^ set(iset):
        s = fset.get(pair, iset.get(pair))
        assert abs(s - 0.95) < 0.02, (pair, s)
    # scores agree to quantization error on the intersection
    for pair in inter:
        assert abs(fset[pair] - iset[pair]) < 0.02


def test_two_stage_topk_equals_single_window(spark):
    """two_stage_topk is EXACT: for any scored frame with a total
    order (tiebreak id), the two-stage result equals the naive single
    per-query window — including duplicate scores and k larger than a
    group. Randomized inputs over a fixed seed grid."""
    import random

    from pyspark.sql.window import Window as W

    from hydraide_spark.functions.vector import two_stage_topk

    rng = random.Random(42)
    for trial in range(3):
        n_q, n_rows = 3, 200
        rows = [
            (q, i, rng.choice([0.1, 0.5, 0.5, 0.9, rng.random()]))
            for q in range(n_q)
            for i in range(n_rows)
        ]
        # drop some rows so one query has fewer than k
        rows = [r for r in rows if not (r[0] == 2 and r[1] >= 5)]
        df = spark.createDataFrame(
            rows, "query_id int, vec_id long, score double"
        ).repartition(8)
        k = [3, 10, 500][trial]
        order = [F.col("score").desc(), F.col("vec_id").asc()]
        got = sorted(
            map(
                tuple,
                two_stage_topk(df, k, "query_id", order)
                .select("query_id", "vec_id", "rank")
                .collect(),
            )
        )
        w = W.partitionBy("query_id").orderBy(*order)
        want = sorted(
            map(
                tuple,
                df.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "vec_id", "rank")
                .collect(),
            )
        )
        assert got == want, f"trial {trial} k={k}"


def test_two_stage_topk_rejects_column_collisions(spark):
    """ADVICE r10: an input frame already carrying 'rank' (common in
    run files) or the stage-internal '_p'/'_lr' temps must be rejected
    loudly — silent overwrite/drop corrupted caller data before."""
    import pytest

    from hydraide_spark.functions.vector import two_stage_topk

    order_cols = lambda: [F.col("score").desc(), F.col("vec_id").asc()]
    base = spark.createDataFrame(
        [(1, 10, 0.5)], "query_id int, vec_id long, score double"
    )
    for bad in ("rank", "_p", "_lr"):
        df = base.withColumn(bad, F.lit(1))
        with pytest.raises(ValueError, match=bad):
            two_stage_topk(df, 3, "query_id", order_cols())
    # clean frame still works
    assert two_stage_topk(base, 3, "query_id", order_cols()).count() == 1
