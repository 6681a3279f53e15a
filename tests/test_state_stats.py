"""Persisted corpus stats for the unified search state (r12 VERDICT
#2): commit markers carry per-epoch row counts, compaction absorbs
pruned markers into a ``_STATS`` base, and the serve-time routers read
the catalog instead of running a count job per call.

Pins:
- stats equal the ingested corpus across epochs, retries and
  compaction (marker absorption),
- the crash window between _STATS absorb and marker unlink cannot
  double-count,
- ZERO count jobs on the serve path when stats exist, with the route
  decision identical to the explicitly-counted call,
- pre-r12 states (empty markers) fall back to the count.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import DataFrame, functions as F

from hydraide_spark.functions.vector import train_ivf_centroids
from hydraide_spark.sources.tables import load_table
from hydraide_spark.streaming.search_stream import (
    ann_topk_auto_from_state,
    committed_epochs,
    compact_unified_search_state,
    make_search_ingest,
    state_stats,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    emb = load_table(spark, SF, "embeddings")
    return emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("vec_id").cast("string")).alias("text"),
        "embedding",
    )


@pytest.fixture()
def state(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    cents = train_ivf_centroids(emb.select("vec_id", "embedding"), n_centroids=4)
    sd = str(tmp_path / "sstate")
    ingest = make_search_ingest(spark, sd, cents)
    ingest(_docs(spark, 0, 100), 0)
    ingest(_docs(spark, 100, 250), 1)
    return sd, ingest, cents


def test_stats_track_ingest_retry_and_compaction(spark, state):
    sd, ingest, _ = state
    st = state_stats(sd)
    assert st == {"rows": 250, "dim": 64}

    # a retried epoch overwrites its marker — no double count
    ingest(_docs(spark, 100, 250), 1)
    assert state_stats(sd)["rows"] == 250

    # compaction prunes markers into the _STATS base; the figure holds
    compact_unified_search_state(spark, sd)
    assert state_stats(sd)["rows"] == 250
    # at least one marker was absorbed (newest is left for retries)
    with open(os.path.join(sd, "_STATS")) as fh:
        base = json.load(fh)
    assert base["base_rows"] >= 100 and base["absorbed"]

    # more epochs after compaction keep accumulating
    ingest(_docs(spark, 250, 300), 2)
    assert state_stats(sd)["rows"] == 300


def test_stats_crash_window_no_double_count(spark, state):
    sd, _, _ = state
    compact_unified_search_state(spark, sd)
    with open(os.path.join(sd, "_STATS")) as fh:
        base = json.load(fh)
    assert base["absorbed"]
    # simulate the crash between _STATS absorb and marker unlink: the
    # absorbed epoch's marker reappears with its original stats
    ep = base["absorbed"][0]
    with open(os.path.join(sd, "_commits", f"epoch={ep}"), "w") as fh:
        json.dump({"rows": 100, "dim": 64}, fh)
    assert state_stats(sd)["rows"] == 250  # skipped: already absorbed
    # the next compaction pass re-prunes it without re-absorbing
    compact_unified_search_state(spark, sd)
    assert state_stats(sd)["rows"] == 250
    assert not os.path.exists(os.path.join(sd, "_commits", f"epoch={ep}"))


def test_serve_path_runs_zero_count_jobs(spark, state, monkeypatch):
    sd, _, _ = state
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # the counted decision, for reference
    counted = ann_topk_auto_from_state(spark, sd, queries, k=5, n_rows=250)
    counted_route = counted.select("route").head()[0]

    def boom(self):
        raise AssertionError("serve path ran a count job")

    monkeypatch.setattr(DataFrame, "count", boom)
    served = ann_topk_auto_from_state(spark, sd, queries, k=5)
    monkeypatch.undo()
    rows = served.collect()
    assert rows and all(r["route"] == counted_route for r in rows)
    assert {(r["query_id"], r["doc_id"]) for r in rows} == {
        (r["query_id"], r["doc_id"]) for r in counted.collect()
    }


def test_filtered_serve_path_count_free_n_rows(spark, state, monkeypatch):
    """ann_topk_filtered_from_state with a forced strategy and stats
    present runs zero count jobs (the survivor count is skipped by the
    forced strategy; n_rows comes from the catalog)."""
    from hydraide_spark.functions.filtered_ann import (
        ann_topk_filtered_from_state,
    )
    from hydraide_spark.query.filters import Cmp, Op

    sd, _, _ = state
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    attrs = emb.select(F.col("vec_id").alias("doc_id"), "label")

    def boom(self):
        raise AssertionError("filtered serve path ran a count job")

    monkeypatch.setattr(DataFrame, "count", boom)
    out = ann_topk_filtered_from_state(
        spark,
        sd,
        Cmp("label", Op.LE, 4),
        queries,
        k=5,
        attrs=attrs,
        strategy="prefilter",
    )
    monkeypatch.undo()
    assert out.count() > 0
    assert out.select("route").head()[0] == "prefilter:exact"


def test_pre_r12_empty_markers_fall_back_to_count(spark, state):
    sd, _, _ = state
    # blank out one marker (pre-r12 form): the catalog must refuse to
    # understate the corpus — rows unknown -> router falls back
    eps = [e for e in committed_epochs(sd) if e >= 0]
    with open(os.path.join(sd, "_commits", f"epoch={eps[0]}"), "w"):
        pass
    st = state_stats(sd)
    assert st is None or st.get("rows") is None
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann_topk_auto_from_state(spark, sd, queries, k=5)
    assert out.count() == 10  # the count fallback still serves
