"""Strict-FIFO subscriber throughput record (r10 VERDICT #7).

`subscribe_strict_fifo` documents its tradeoff — delivery parallelism
1 per swamp, each batch collected to the driver — but shipped no
number. This measures, on one backlog shape:

- ``default_parallel``: the plain `subscribe` stream drained through a
  counting foreachBatch (partition-parallel, no ordering guarantee) —
  the throughput ceiling.
- ``strict_single``: one strict subscriber draining the same backlog
  in total commit order.
- ``strict_two_swamps``: two stores with identical backlogs, two
  strict subscribers running CONCURRENTLY — events/sec should ≈ 2×
  strict_single (serial per swamp, parallel across swamps; the
  reference's fan-out cost model, hydra.go:950-1019).

Writes BENCH_fifo.json at the repo root.
Usage: python tools/fifo_stress.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hydraide_spark.session import get_spark  # noqa: E402
from hydraide_spark.sources.store import TreasureStore  # noqa: E402
from hydraide_spark.streaming.subscribe import (  # noqa: E402
    subscribe,
    subscribe_strict_fifo,
)

WORK = os.path.join(_REPO, ".fifo_scale")


def build_store(spark, path: str, n_commits: int, rows: int) -> TreasureStore:
    shutil.rmtree(path, ignore_errors=True)
    store = TreasureStore(spark, path)
    store.init(
        spark.createDataFrame([], "key string, val long, expired_at timestamp")
    )
    for c in range(n_commits):
        store.set(
            spark.range(rows).select(
                F.concat(F.lit(f"c{c}-"), F.col("id").cast("string")).alias("key"),
                F.col("id").alias("val"),
                F.lit(None).cast("timestamp").alias("expired_at"),
            )
        )
    return store


def drain_default(spark, store) -> tuple[int, float]:
    seen = {"n": 0}

    def count(batch_df, _epoch):
        seen["n"] += batch_df.count()

    q = (
        subscribe(spark, store)
        .writeStream.outputMode("append")
        .queryName("fifo_default")
        .foreachBatch(count)
        .start()
    )
    t0 = time.monotonic()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return seen["n"], time.monotonic() - t0


def drain_strict(spark, stores) -> tuple[int, float]:
    counters = [{"n": 0} for _ in stores]

    def mk(c):
        def on_events(rows, _epoch):
            c["n"] += len(rows)

        return on_events

    qs = [
        subscribe_strict_fifo(
            spark, s, mk(c), queue_name=f"fifo_strict_{i}"
        )
        for i, (s, c) in enumerate(zip(stores, counters))
    ]
    t0 = time.monotonic()
    try:
        for q in qs:
            q.processAllAvailable()
    finally:
        for q in qs:
            q.stop()
    return sum(c["n"] for c in counters), time.monotonic() - t0


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark("fifo_stress", master="local[32]", shuffle_partitions=32)

    store_a = build_store(spark, os.path.join(WORK, "a"), n_commits, rows)
    store_b = build_store(spark, os.path.join(WORK, "b"), n_commits, rows)

    n_def, w_def = drain_default(spark, store_a)
    n_s1, w_s1 = drain_strict(spark, [store_b])
    # fresh backlogs for the concurrent case
    store_c = build_store(spark, os.path.join(WORK, "c"), n_commits, rows)
    store_d = build_store(spark, os.path.join(WORK, "d"), n_commits, rows)
    n_s2, w_s2 = drain_strict(spark, [store_c, store_d])

    out = {
        "metric": "strict_fifo_throughput",
        "n_commits": n_commits,
        "rows_per_commit": rows,
        "configs": {
            "default_parallel": {
                "events": n_def,
                "wall_sec": round(w_def, 2),
                "events_per_sec": round(n_def / w_def),
            },
            "strict_single": {
                "events": n_s1,
                "wall_sec": round(w_s1, 2),
                "events_per_sec": round(n_s1 / w_s1),
            },
            "strict_two_swamps": {
                "events": n_s2,
                "wall_sec": round(w_s2, 2),
                "events_per_sec": round(n_s2 / w_s2),
                "scaling_vs_single": round((n_s2 / w_s2) / (n_s1 / w_s1), 2),
            },
        },
        "note": (
            "strict = total-commit-order delivery, 1 delivery point per "
            "swamp, driver-collected batches; parallel across swamps. "
            "default = partition-parallel stream (per-file order only)."
        ),
    }
    with open(os.path.join(_REPO, "BENCH_fifo.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
