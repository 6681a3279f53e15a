"""ann_topk_auto — the ANN route planner (r10 VERDICT #4): the
reference's bucket-planner idea (bucket_planner.go:55-123, "first
indexable leg wins") lifted to ANN. Pins:

- the pure route decision per regime (thresholds in SCALE.md),
- the bucket-route invariant: the auto result at gate scale IS the
  exact path's result (also oracle-gated via golden ann_topk_auto),
- each forced route's physical plan shape (exact/int8 use the
  two-stage top-k, cell routes use a broadcast cell equi-join and
  never a full-corpus per-query window funnel),
- recall floors of the approximate regimes against the exact path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.vector import (
    ANN_EXACT_MAX_ROWS,
    ANN_FLAT_INT8_MAX_ROWS,
    ANN_PQ_MIN_DIM,
    ann_route,
    ann_topk_auto,
    cosine_topk,
)
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_route_decision_regimes():
    assert ann_route(1_000, 64) == "exact"
    assert ann_route(ANN_EXACT_MAX_ROWS, 64) == "exact"
    assert ann_route(ANN_EXACT_MAX_ROWS + 1, 64) == "int8"
    assert ann_route(ANN_FLAT_INT8_MAX_ROWS, 64) == "int8"
    assert ann_route(ANN_FLAT_INT8_MAX_ROWS + 1, 64) == "ivf_int8"
    assert ann_route(ANN_FLAT_INT8_MAX_ROWS + 1, ANN_PQ_MIN_DIM) == "ivfadc"
    assert ann_route(10**9, 128) == "ivf_int8"
    assert ann_route(10**9, 1024) == "ivfadc"


def _emb_queries(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb, queries


def test_auto_picks_exact_and_equals_exact_path(spark):
    """The bucket-route invariant at gate scale: the planner selects
    'exact' and the routed ranks equal the brute-force ranking."""
    emb, queries = _emb_queries(spark)
    out = ann_topk_auto(emb, queries, k=10)
    rows = out.collect()
    assert {r["route"] for r in rows} == {"exact"}
    got = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)
    exact = cosine_topk(emb, queries, k=10).collect()
    by_q: dict = {}
    for r in exact:
        by_q.setdefault(r["query_id"], []).append((r["score"], r["vec_id"]))
    want = sorted(
        (q, i + 1, vid)
        for q, scored in by_q.items()
        for i, (_, vid) in enumerate(
            sorted(scored, key=lambda t: (-t[0], t[1]))
        )
    )
    assert got == want


def test_forced_routes_plan_shapes_and_recall(spark):
    """Each forced route runs its own physical strategy (n_rows
    overrides let a small frame exercise every regime):

    - exact/int8: two-stage top-k (SPARK_PARTITION_ID in the plan, the
      no-funnel shape) and NO cell join;
    - ivf_int8/ivfadc: a broadcast equi-join on the probed cells —
      candidate generation by blocking, never a full-corpus funnel.

    And every approximate route keeps a top-10 overlap with the exact
    ranking on real embeddings."""
    emb, queries = _emb_queries(spark)
    exact_sets: dict = {}
    for r in cosine_topk(emb, queries, k=10).collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    from hydraide_spark.functions.vector import train_ivf_centroids

    # forcing big-corpus routes onto a small frame: supply models sized
    # for the ACTUAL corpus (auto_ivf_k of the override would train 65K
    # cells on 2K rows — every point its own cell, recall collapse)
    cents = train_ivf_centroids(
        emb.select(F.col("vec_id"), "embedding"), n_centroids=8
    )
    floors = {"int8": 0.8, "ivf_int8": 0.5, "ivfadc": 0.3}
    for route, floor in floors.items():
        out = ann_topk_auto(
            emb, queries, k=10, route=route, n_rows=2**30, dim=64, nprobe=2,
            centroids=cents,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if route == "int8":
            assert "SPARK_PARTITION_ID" in plan, route
            assert "_cell" not in plan, route
        else:
            assert "_cell" in plan, route
            assert "BroadcastHashJoin" in plan, route
        got_sets: dict = {}
        for r in out.collect():
            assert r["route"] == route
            got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(exact_sets[q] & got_sets.get(q, set())) / 10
            for q in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= floor, (route, recalls)

    # the IVFADC refine step (rerank_factor) lifts recall — the
    # production setting for that route
    out = ann_topk_auto(
        emb, queries, k=10, route="ivfadc", n_rows=2**30, dim=64,
        nprobe=2, rerank_factor=4, centroids=cents,
    )
    got_sets = {}
    for r in out.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / 10 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    # the exact route's plan: two-stage, no cell join
    out = ann_topk_auto(emb, queries, k=10, route="exact", n_rows=10, dim=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan
    assert "_cell" not in plan


def test_auto_rejects_unknown_route(spark):
    import pytest

    emb, queries = _emb_queries(spark)
    with pytest.raises(ValueError, match="unknown route"):
        ann_topk_auto(emb, queries, k=5, route="warp", n_rows=10, dim=64)


def test_auto_from_state_routes_and_matches_batch(spark, tmp_path):
    """The router's persisted-state leg: same regime thresholds, data
    read from the unified state. Pins per-route equivalence with the
    batch router where the representations coincide (exact route reads
    the persisted raw vectors; int8/ivf_int8 read the persisted codes
    built by the same quantization expressions) and the
    availability fallback (no PQ model -> ivfadc falls to ivf_int8)."""
    from hydraide_spark.functions.vector import train_ivf_centroids
    from hydraide_spark.sources.tables import load_table
    from hydraide_spark.streaming.search_stream import (
        ann_topk_auto_from_state,
        make_search_ingest,
        store_ivf_model,
    )
    import os

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id").select("doc_id", "text", "embedding").persist()
    cents = train_ivf_centroids(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), n_centroids=8
    )
    state = str(tmp_path / "ustate")
    os.makedirs(state, exist_ok=True)
    store_ivf_model(state, cents)
    ingest = make_search_ingest(spark, state, cents)
    for e in range(2):
        ingest(corpus.filter(F.col("doc_id") % 2 == e), e)

    queries = corpus.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    emb_batch = corpus.select(F.col("doc_id").alias("vec_id"), "embedding")

    def rows(df, idc):
        return sorted((r["query_id"], r["rank"], r[idc]) for r in df.collect())

    # auto at gate scale -> exact over the persisted vectors == batch
    got = ann_topk_auto_from_state(spark, state, queries, k=10)
    assert {r["route"] for r in got.collect()} == {"exact"}
    want = ann_topk_auto(emb_batch, queries, k=10)
    assert rows(got, "doc_id") == rows(want, "vec_id")

    # forced int8/ivf_int8 from persisted codes == batch forced routes
    for route in ("int8", "ivf_int8"):
        got = ann_topk_auto_from_state(
            spark, state, queries, k=10, route=route, n_rows=2**30
        )
        assert {r["route"] for r in got.collect()} == {route}
        want = ann_topk_auto(
            emb_batch, queries, k=10, route=route, n_rows=2**30, dim=64,
            centroids=cents,
        )
        assert rows(got, "doc_id") == rows(want, "vec_id"), route

    # no PQ model bootstrapped -> ivfadc request routes to ivf_int8
    got = ann_topk_auto_from_state(
        spark, state, queries, k=10, route="ivfadc", n_rows=2**30
    )
    assert {r["route"] for r in got.collect()} == {"ivf_int8"}
    corpus.unpersist()


def test_auto_from_state_empty_query_batch(spark, tmp_path):
    """r11 review: an empty query batch must yield the empty routed
    result via the exact route — not resolve models for nothing (a
    big-n override without a stored IVF model used to raise)."""
    from hydraide_spark.functions.vector import train_ivf_centroids
    from hydraide_spark.streaming.search_stream import (
        ann_topk_auto_from_state,
        make_search_ingest,
    )

    emb, _ = _emb_queries(spark)
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("vec_id").cast("string")).alias("text"),
        "embedding",
    )
    cents = train_ivf_centroids(
        emb.select("vec_id", "embedding"), n_centroids=4
    )
    state = str(tmp_path / "ustate")
    # note: NO store_ivf_model — the int8 route would raise on resolve
    make_search_ingest(spark, state, cents)(docs, 0)
    empty_q = spark.createDataFrame(
        [], "query_id long, query_vec array<double>"
    )
    out = ann_topk_auto_from_state(
        spark, state, empty_q, k=5, n_rows=2**30
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "rank", "route"]


def test_pq_refuses_non_divisible_dim(spark):
    """r11 VERDICT defect: PQ silently dropped tail components when
    dim % m != 0 (train/encode/ADC all used dim // m). Now every PQ
    entry point refuses loudly, and ann_topk_auto picks m from the
    divisors of dim (pq_m_for_dim) so e.g. a prime dim routes with ONE
    full-width subspace — full-dimension distances, never truncation."""
    import pytest as _pytest

    from hydraide_spark.functions.vector import (
        pq_codes_expr,
        pq_m_for_dim,
        train_pq_codebooks,
    )

    # the pure divisor picker
    assert pq_m_for_dim(64) == 8
    assert pq_m_for_dim(60) == 6
    assert pq_m_for_dim(257) == 1  # prime -> single full-width subspace
    assert pq_m_for_dim(12, preferred=8) == 6

    # expression-level guard (no Spark job needed to trip it)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_codes_expr(F.col("embedding"), [[(0, [0.0] * 3)]] * 2, dim=7)

    # training guard on a real frame with dim=5, m=2
    emb5 = load_table(spark, SF, "embeddings").select(
        "vec_id", F.slice("embedding", 1, 5).alias("embedding")
    )
    with _pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb5, m=2, k=4, sample_rows=50)

    # auto router on a prime dim must NOT crash: m=1 codebooks cover
    # the full dimension (forced ivfadc route exercises the default)
    emb7 = load_table(spark, SF, "embeddings").select(
        "vec_id", F.slice("embedding", 1, 7).alias("embedding")
    )
    queries = emb7.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from hydraide_spark.functions.vector import train_ivf_centroids

    cents = train_ivf_centroids(emb7, n_centroids=4)
    out = ann_topk_auto(
        emb7, queries, k=5, route="ivfadc", centroids=cents, nprobe=4
    )
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["route"] == "ivfadc" for r in rows)


def test_ann_recall_report_routes_and_floors(spark):
    """r14 serving QA (functions/vector.py::ann_recall_report): one
    row per route, exact integer counts, the exact route recall
    EXACTLY 1.0 (self-check the harness is sound), and every
    approximate route above its pytest floor — the same floors the
    forced-route test pins, now measured by the shipped operator."""
    from hydraide_spark.functions.vector import (
        ann_recall_report,
        train_ivf_centroids,
    )

    emb, queries = _emb_queries(spark)
    cents = train_ivf_centroids(
        emb.select(F.col("vec_id"), "embedding"), n_centroids=8
    )
    rep = {
        r["route"]: r
        for r in ann_recall_report(
            emb, queries, 10,
            routes=("exact", "int8", "ivf_int8"),
            n_rows=2**30, dim=64, centroids=cents, nprobe=2,
        ).collect()
    }
    assert set(rep) == {"exact", "int8", "ivf_int8"}
    for r in rep.values():
        assert r["k"] == 10
        assert r["n_queries"] == 5
        assert r["n_truth"] == 50
        assert 0 <= r["n_hit"] <= r["n_truth"]
        assert r["recall"] == round(r["n_hit"] / r["n_truth"], 10)
    assert rep["exact"]["recall"] == 1.0
    assert rep["int8"]["recall"] >= 0.8
    assert rep["ivf_int8"]["recall"] >= 0.5


def test_ann_recall_report_from_state_matches_batch(spark, tmp_path):
    """The from_state QA variant measures the SERVED path: truth from
    the state's persisted float vectors, routes through
    ann_topk_auto_from_state. Because ingest and batch quantize with
    the same expressions, each route's report must EQUAL the batch
    report over the same corpus/models."""
    import os

    from hydraide_spark.functions.vector import (
        ann_recall_report,
        train_ivf_centroids,
    )
    from hydraide_spark.sources.tables import load_table
    from hydraide_spark.streaming.search_stream import (
        ann_recall_report_from_state,
        make_search_ingest,
        store_ivf_model,
    )

    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    docs = emb.select(
        "doc_id",
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias("text"),
        "embedding",
    ).persist()
    cents = train_ivf_centroids(
        docs.select(F.col("doc_id").alias("vec_id"), "embedding"), n_centroids=8
    )
    state = str(tmp_path / "ustate")
    os.makedirs(state, exist_ok=True)
    store_ivf_model(state, cents)
    ingest = make_search_ingest(spark, state, cents)
    for e in range(2):
        ingest(docs.filter(F.col("doc_id") % 2 == e), e)

    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        r["route"]: (r["n_queries"], r["n_truth"], r["n_hit"], r["recall"])
        for r in ann_recall_report_from_state(
            spark, state, queries, 10, routes=("int8", "ivf_int8"), nprobe=2
        ).collect()
    }
    want = {
        r["route"]: (r["n_queries"], r["n_truth"], r["n_hit"], r["recall"])
        for r in ann_recall_report(
            docs.select(F.col("doc_id").alias("vec_id"), "embedding"),
            queries, 10,
            routes=("int8", "ivf_int8"),
            n_rows=2**30, dim=64, centroids=cents, nprobe=2,
        ).collect()
    }
    assert got == want
    assert got["int8"][3] >= 0.8
    docs.unpersist()
