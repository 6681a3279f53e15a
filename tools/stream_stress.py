"""Streaming-loop scale records: the batch operators have ×30/×100
growth exponents (BENCH_scale*.json); this harness measures the
MAINTENANCE LOOPS' per-batch cost as the accumulated index grows — the
O(delta) claim behind every foreachBatch design in streaming/.

Protocol: replicate sf0.1 through tools/scale_stress.build_corpus
(token-permuted docs, isometry-perturbed embeddings — linear duplicate
volume), feed the loops FIXED-SIZE deltas, and time each epoch's ingest
call directly (the foreachBatch body — stream scheduling overhead would
only add constant noise). The fit compares the MEDIAN of the early
epochs (2-4, first-touch excluded per the r5 warm-protocol lesson)
against the median of the last three, on accumulated-index-size axes:

    b = ln(t_late / t_early) / ln(n_late / n_early)

b ~ 0 is the O(delta) claim (per-batch cost independent of index size);
b ~ 1 means each batch re-reads the whole accumulated index. The query
paths (bm25_from_state, ivf_query_persisted, hybrid) are measured at
the early and final index sizes the same way.

Usage:
    python tools/stream_stress.py [n_batches] [delta_rows]
Writes BENCH_stream_scale.json at the repo root and prints a table.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from hydraide_spark.session import get_spark  # noqa: E402
from hydraide_spark.sources.tables import load_table  # noqa: E402
from scale_stress import build_corpus  # noqa: E402

WORK = os.path.join(_REPO, ".stream_scale")
WORDS = ["stream", "data", "query"]


def _fit(ts: list[float], ns: list[int]) -> dict:
    """Median(epochs 2-4) vs median(last 3) on accumulated-size axes."""
    early_t = statistics.median(ts[2:5])
    late_t = statistics.median(ts[-3:])
    early_n = ns[3]  # size after the middle early epoch
    late_n = ns[len(ns) - 2]
    b = math.log(late_t / early_t) / math.log(late_n / early_n)
    return {
        "growth_exponent": round(b, 2),
        "t_early_med": round(early_t, 3),
        "t_late_med": round(late_t, 3),
        "n_early": early_n,
        "n_late": late_n,
        "per_epoch_sec": [round(t, 3) for t in ts],
    }


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("stream_stress", master="local[32]", shuffle_partitions=32)

    corpus_dir = os.path.join(WORK, "corpus")
    build_corpus(spark, corpus_dir, mult=max(2, (n_batches * delta) // 2000))
    docs = load_table(spark, corpus_dir, "documents")
    emb = load_table(spark, corpus_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    joined = docs.join(emb, "doc_id").select("doc_id", "text", "embedding")
    # stable batch assignment: ntile by hashed id, materialized once
    batched = joined.withColumn(
        "_b", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)).cast("int")
    ).persist()
    per_b = batched.groupBy("_b").count().collect()
    sizes = {r["_b"]: r["count"] for r in per_b}
    print(f"batches={n_batches} rows/batch≈{statistics.median(sizes.values())}")

    from hydraide_spark.functions.vector import train_ivf_centroids
    from hydraide_spark.streaming.dedup_stream import make_ingest as make_dedup
    from hydraide_spark.streaming.search_stream import (
        bm25_from_state,
        committed_epochs,
        compact_unified_search_state,
        hybrid_search_from_unified_state,
        make_search_ingest,
    )

    cents = train_ivf_centroids(
        batched.select(F.col("doc_id").alias("vec_id"), "embedding"),
        n_centroids=16,
    )
    qrow = batched.limit(1).head()
    queries = spark.createDataFrame(
        [(0, [float(x) for x in qrow["embedding"]])],
        "query_id long, query_vec array<double>",
    )

    results: dict = {}
    ns = []
    acc = 0

    # --- unified search ingest (postings + doclen + IVF cells) ----------
    # maintenance is the TIERED tick every 6 epochs (r10 VERDICT #2):
    # committed epochs fold into an L1 run (cost ∝ delta), the full
    # base rewrite only on L1 pressure — tick walls are recorded so
    # the fold-cost-∝-delta claim is measured, not asserted
    ustate = os.path.join(WORK, "ustate")
    shutil.rmtree(ustate, ignore_errors=True)
    ingest_u = make_search_ingest(spark, ustate, cents)
    ts_u, q_early, q_late, u_ticks = [], None, None, []
    for e in range(n_batches):
        b = batched.filter(F.col("_b") == e).drop("_b")
        t0 = time.monotonic()
        ingest_u(b, e)
        ts_u.append(time.monotonic() - t0)
        acc += sizes.get(e, 0)
        ns.append(acc)
        if e % 6 == 5 and e != n_batches - 1:
            t0 = time.monotonic()
            tick = compact_unified_search_state(spark, ustate, tiered=True)
            u_ticks.append(
                {
                    "after_epoch": e,
                    "sec": round(time.monotonic() - t0, 3),
                    "postings": tick["postings"],
                    "index_rows": acc,
                }
            )
        if e in (3, n_batches - 1):
            if e == n_batches - 1:
                # realistic ops: compacted state (postings base is
                # word-bucketed since r10, so the serve read prunes)
                t0 = time.monotonic()
                tick = compact_unified_search_state(spark, ustate, tiered=True)
                u_ticks.append(
                    {
                        "after_epoch": e,
                        "sec": round(time.monotonic() - t0, 3),
                        "postings": tick["postings"],
                        "index_rows": acc,
                    }
                )
            eps = committed_epochs(ustate)
            t0 = time.monotonic()
            bm25_from_state(spark, ustate, WORDS, epochs=eps).groupBy(
                "doc_id"
            ).agg(F.sum("term_score")).count()
            t_bm = time.monotonic() - t0
            t0 = time.monotonic()
            hybrid_search_from_unified_state(
                spark, ustate, WORDS, queries, cents, topk_per_side=20, topk=10
            ).count()
            t_hy = time.monotonic() - t0
            if e == 3:
                q_early = (t_bm, t_hy)
            else:
                q_late = (t_bm, t_hy)
    results["unified_search_ingest"] = _fit(ts_u, ns)
    results["unified_search_ingest"]["tiered_ticks"] = u_ticks
    n_e, n_l = ns[3], ns[-1]
    results["bm25_from_state_query"] = {
        "growth_exponent": round(
            math.log(q_late[0] / q_early[0]) / math.log(n_l / n_e), 2
        ),
        "t_early": round(q_early[0], 3),
        "t_late": round(q_late[0], 3),
        "n_early": n_e,
        "n_late": n_l,
    }
    results["hybrid_from_state_query"] = {
        "growth_exponent": round(
            math.log(q_late[1] / q_early[1]) / math.log(n_l / n_e), 2
        ),
        "t_early": round(q_early[1], 3),
        "t_late": round(q_late[1], 3),
        "n_early": n_e,
        "n_late": n_l,
    }

    # --- near-dup (MinHash LSH) ingest -----------------------------------
    # realistic ops shape: periodic compaction (maintenance, timed
    # separately) rewrites the base bucket-partitioned, so probes
    # directory-prune it (state_compact.compact_band_epochs)
    from hydraide_spark.streaming.dedup_stream import (
        band_buckets,
        bands_probe_frame,
    )
    from hydraide_spark.streaming.state_compact import (
        compact_neardup_state,
        read_nbuckets,
    )

    dstate = os.path.join(WORK, "dstate")
    bands_dir = os.path.join(dstate, "bands")
    shutil.rmtree(dstate, ignore_errors=True)
    phase_rows: list = []  # per-epoch per-phase walls (r10 VERDICT #1)
    ingest_d = make_dedup(spark, dstate, tau=0.8, timings=phase_rows)
    trickle = (
        batched.filter(F.col("_b") == 0)
        .limit(2)
        .select((F.col("doc_id") + F.lit(10**9)).alias("doc_id"), "text")
    ).persist()
    trickle.count()
    ts_d, ts_compact, prune_points, trickle_walls = [], [], [], []

    def _prune_point(tag: str, epoch_id: int) -> None:
        """Fraction of the compacted base the probe of a FIXED 2-doc
        trickle delta actually reads (file-level, via input_file_name)
        + the wall of a full trickle ingest epoch. The design claim is
        fraction ∝ delta_buckets/n_buckets with n_buckets growing with
        the corpus, so both stay flat-to-falling as the index grows."""
        nb = read_nbuckets(bands_dir)
        # unique ids per call — the loop contract is each doc_id once
        delta = trickle.select(
            (F.col("doc_id") + F.lit(epoch_id * 10**6)).alias("doc_id"),
            "text",
        )
        delta_banded = band_buckets(delta)
        probe = bands_probe_frame(spark, bands_dir, delta_banded, epoch_id)
        read_files = {
            r[0]
            for r in probe.select(F.input_file_name()).distinct().collect()
            if "epoch=-1" in r[0]
        }
        total = sum(
            1
            for _root, _d, fs in os.walk(os.path.join(bands_dir, "epoch=-1"))
            for f in fs
            if f.endswith(".parquet")
        )
        t0 = time.monotonic()
        ingest_d(delta, epoch_id)
        wall = time.monotonic() - t0
        trickle_walls.append(round(wall, 3))
        prune_points.append(
            {
                "at": tag,
                "n_buckets": nb,
                "base_files_total": total,
                "base_files_read": len(read_files),
                "read_fraction": round(len(read_files) / max(total, 1), 3),
                "trickle_ingest_sec": round(wall, 3),
            }
        )

    for e in range(n_batches):
        b = batched.filter(F.col("_b") == e).select("doc_id", "text")
        t0 = time.monotonic()
        ingest_d(b, e)
        ts_d.append(time.monotonic() - t0)
        # tiered maintenance tick every 3 epochs: minor folds cost
        # ∝ folded delta (their walls should stay FLAT as the index
        # grows — the VERDICT #2 "fold cost ∝ delta" measurement);
        # the first tick majors (no base yet), later majors only on
        # L1 pressure
        if e % 3 == 2:
            t0 = time.monotonic()
            tick = compact_neardup_state(spark, dstate, tiered=True)
            ts_compact.append(
                {
                    "after_epoch": e,
                    "sec": round(time.monotonic() - t0, 3),
                    "bands": tick["bands"],
                    "shingles": tick["shingles"],
                    "index_rows": ns[e],
                }
            )
        if e in (n_batches // 2 - 1, n_batches - 1):
            _prune_point(
                "mid" if e == n_batches // 2 - 1 else "final", 1000 + e
            )
    trickle.unpersist()
    results["minhash_neardup_ingest"] = _fit(ts_d, ns)
    results["minhash_neardup_ingest"]["tiered_ticks"] = ts_compact
    results["minhash_neardup_ingest"]["phase_per_epoch"] = phase_rows
    results["minhash_probe_prune"] = {
        "points": prune_points,
        "trickle_wall_ratio": round(
            trickle_walls[-1] / trickle_walls[0], 2
        )
        if len(trickle_walls) >= 2
        else None,
        "note": (
            "fixed 2-doc delta probed against the compacted bucket-"
            "partitioned base at mid vs final index size: read_fraction "
            "~ delta_buckets/n_buckets and n_buckets grows with the "
            "corpus, so trickle-probe IO is O(delta), not O(index). "
            "Large batch deltas still touch every bucket dir by design "
            "(their buckets hash everywhere) — the prune targets the "
            "streaming/serving regime."
        ),
    }

    batched.unpersist()
    out = {
        "metric": "stream_scale",
        "n_batches": n_batches,
        "delta_rows_median": int(statistics.median(sizes.values())),
        "note": (
            "per-epoch ingest wall vs ACCUMULATED index size; fit uses "
            "median(epochs 2-4) vs median(last 3) — b~0 is the O(delta) "
            "claim, b~1 means the loop re-reads the whole index per batch. "
            "query rows measure the serving path at early vs final index."
        ),
        "loops": results,
    }
    path = os.path.join(_REPO, "BENCH_stream_scale.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
