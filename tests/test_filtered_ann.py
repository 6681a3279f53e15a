"""Filtered ANN (r12 VERDICT #1) — scalar predicate × ANN route.

Pins:
- the pure pre-vs-post-filter decision per regime,
- prefilter ≡ exact filtered ranking at gate scale (also oracle-gated
  via golden ann_topk_filtered, route literal included),
- predicate pushdown: the prefilter leg's scalar predicate reaches
  PushedFilters on the parquet scan,
- the postfilter refill loop: forced postfilter with a selective
  predicate and nprobe=1 must WIDEN until every query has k
  predicate-passing survivors, with a recall floor vs the exact
  filtered ranking,
- the persisted-state variant routes both ways and matches the batch
  semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.filtered_ann import (
    ann_filtered_route,
    ann_topk_filtered,
)
from hydraide_spark.functions.vector import (
    ANN_EXACT_MAX_ROWS,
    ANN_FLAT_INT8_MAX_ROWS,
    cosine_topk,
)
from hydraide_spark.plans.inspect import has_pushed_filters
from hydraide_spark.query.filters import Cmp, Op
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_filtered_route_decision_regimes():
    # flat-scan base regimes: always prefilter (the scan reads
    # everything anyway; filtering first strictly shrinks it)
    assert ann_filtered_route(50_000, 40_000, 64) == "prefilter"
    assert ann_filtered_route(ANN_FLAT_INT8_MAX_ROWS, 4_000_000, 64) == "prefilter"
    # cell-routed base: selective predicate -> prefilter the survivors
    assert ann_filtered_route(1_000_000_000, 1_000_000, 64) == "prefilter"
    assert (
        ann_filtered_route(1_000_000_000, ANN_FLAT_INT8_MAX_ROWS, 64)
        == "prefilter"
    )
    # cell-routed base + unselective predicate -> probe and refill
    assert ann_filtered_route(1_000_000_000, 500_000_000, 64) == "postfilter"
    assert (
        ann_filtered_route(ANN_FLAT_INT8_MAX_ROWS + 1, ANN_FLAT_INT8_MAX_ROWS + 1, 64)
        == "postfilter"
    )


def _emb_queries(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb, queries


def _exact_filtered(emb, queries, pred_col, k=10):
    out = cosine_topk(emb.filter(pred_col), queries, k=k)
    return {
        (r["query_id"], r["vec_id"])
        for r in out.select("query_id", "vec_id").collect()
    }


def test_prefilter_equals_exact_filtered_ranking(spark):
    emb, queries = _emb_queries(spark)
    got = ann_topk_filtered(emb, Cmp("label", Op.LE, 4), queries, k=10)
    rows = got.collect()
    assert all(r["route"] == "prefilter:exact" for r in rows)
    assert {(r["query_id"], r["vec_id"]) for r in rows} == _exact_filtered(
        emb, queries, F.col("label") <= 4
    )
    # every returned row satisfies the predicate
    labels = dict(emb.select("vec_id", "label").collect())
    assert all(labels[r["vec_id"]] <= 4 for r in rows)


def test_prefilter_pushes_predicate_into_scan(spark):
    """The prefilter leg's scalar predicate must reach the parquet scan
    (PushedFilters) — at 100 TB the filtered exact path costs exactly
    the pruned survivor read, never a full-corpus decode."""
    emb, queries = _emb_queries(spark)
    out = ann_topk_filtered(
        emb, Cmp("label", Op.LE, 4), queries, k=10, strategy="prefilter"
    )
    assert has_pushed_filters(out, "LessThanOrEqual(label,4)")


def test_postfilter_widens_until_k_and_recall(spark):
    """Forced postfilter with a selective predicate (1 label in 10) and
    nprobe=1: the first probe cannot hold 10 survivors for every query,
    so the refill loop must widen. Every query ends with exactly k
    predicate-passing rows (the corpus has ~50 label-3 rows) and recall
    vs the exact filtered ranking clears the floor."""
    emb, queries = _emb_queries(spark)
    got = ann_topk_filtered(
        emb,
        Cmp("label", Op.EQ, 3),
        queries,
        k=10,
        strategy="postfilter",
        nprobe=1,
    )
    rows = got.collect()
    assert all(r["route"] == "postfilter:ivf" for r in rows)
    labels = dict(emb.select("vec_id", "label").collect())
    assert all(labels[r["vec_id"]] == 3 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, 11)), (q, sorted(ranks))
    # recall is probe-bound by design (the loop stops once k survivors
    # exist, not once every cell is read): floor, not equality
    truth = _exact_filtered(emb, queries, F.col("label") == 3)
    hits = len({(r["query_id"], r["vec_id"]) for r in rows} & truth)
    assert hits / len(truth) >= 0.25, hits / len(truth)


def test_postfilter_full_probe_equals_exact_filtered(spark):
    """With nprobe = n_cells the postfilter path scans every cell: the
    result must EQUAL the exact filtered ranking, rank for rank — the
    postfilter machinery's own bucket-route invariant (approximation
    comes ONLY from probe pruning, never from the filter/score/rank
    plumbing)."""
    from hydraide_spark.functions.vector import train_ivf_centroids

    emb, queries = _emb_queries(spark)
    cents = train_ivf_centroids(emb.select("vec_id", "embedding"), n_centroids=8)
    got = ann_topk_filtered(
        emb,
        Cmp("label", Op.EQ, 3),
        queries,
        k=10,
        strategy="postfilter",
        centroids=cents,
        nprobe=8,
    )
    exact = cosine_topk(emb.filter(F.col("label") == 3), queries, k=10)
    from hydraide_spark.functions.vector import rank_route_survivors

    exact_ranked = rank_route_survivors(
        exact, "query_id", "vec_id", "score", descending=True
    )
    want = {
        (r["query_id"], r["vec_id"], r["rank"]) for r in exact_ranked.collect()
    }
    assert {
        (r["query_id"], r["vec_id"], r["rank"]) for r in got.collect()
    } == want


def test_postfilter_fewer_than_k_when_predicate_starves(spark):
    """A predicate with fewer than k matches in the WHOLE corpus: the
    loop must terminate (probe exhaustion) and emit every match, not
    spin or raise."""
    emb, queries = _emb_queries(spark)
    # exactly the 3 lowest vec_ids with label 3
    triple = [
        r["vec_id"]
        for r in emb.filter(F.col("label") == 3)
        .orderBy("vec_id")
        .limit(3)
        .collect()
    ]
    got = ann_topk_filtered(
        emb,
        F.col("vec_id").isin(triple),
        queries,
        k=10,
        strategy="postfilter",
        nprobe=1,
    )
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, ids in per_q.items():
        assert ids == set(triple)


def test_filtered_from_state_both_strategies(spark, tmp_path):
    """The persisted-state variant: attrs joined on id supply the
    predicate column; prefilter matches the batch exact filtered
    ranking; forced postfilter reads the persisted cell column and
    clears the same recall floor."""
    from hydraide_spark.functions.filtered_ann import (
        ann_topk_filtered_from_state,
    )
    from hydraide_spark.functions.vector import train_ivf_centroids
    from hydraide_spark.streaming.search_stream import (
        make_search_ingest,
        store_ivf_model,
    )

    emb, queries = _emb_queries(spark)
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("vec_id").cast("string")).alias("text"),
        "embedding",
    )
    cents = train_ivf_centroids(emb.select("vec_id", "embedding"), n_centroids=8)
    state = str(tmp_path / "fstate")
    import os

    os.makedirs(state, exist_ok=True)
    store_ivf_model(state, cents)
    make_search_ingest(spark, state, cents)(docs, 0)
    attrs = emb.select(F.col("vec_id").alias("doc_id"), "label")

    pre = ann_topk_filtered_from_state(
        spark, state, Cmp("label", Op.LE, 4), queries, k=10, attrs=attrs
    )
    pre_rows = pre.collect()
    assert all(r["route"] == "prefilter:exact" for r in pre_rows)
    truth = _exact_filtered(emb, queries, F.col("label") <= 4)
    assert {(r["query_id"], r["doc_id"]) for r in pre_rows} == truth

    post = ann_topk_filtered_from_state(
        spark,
        state,
        Cmp("label", Op.LE, 4),
        queries,
        k=10,
        attrs=attrs,
        strategy="postfilter",
        nprobe=2,
    )
    post_rows = post.collect()
    assert all(r["route"] == "postfilter:ivf" for r in post_rows)
    labels = dict(emb.select("vec_id", "label").collect())
    assert all(labels[r["doc_id"]] <= 4 for r in post_rows)
    # probe-bound recall floor (2 of 8 cells probed, unselective
    # predicate never forces widening)
    hits = len({(r["query_id"], r["doc_id"]) for r in post_rows} & truth)
    assert hits / len(truth) >= 0.25, hits / len(truth)

    # full probe: the state postfilter machinery must reproduce the
    # exact filtered ranking (same invariant as the batch path)
    full = ann_topk_filtered_from_state(
        spark,
        state,
        Cmp("label", Op.LE, 4),
        queries,
        k=10,
        attrs=attrs,
        strategy="postfilter",
        nprobe=8,
    )
    assert {(r["query_id"], r["doc_id"]) for r in full.collect()} == truth
