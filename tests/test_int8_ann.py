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
