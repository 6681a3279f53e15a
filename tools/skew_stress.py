"""Skew-hardening record for the near-dup verify join (r10 VERDICT #5).

Workload: the crawl-ingest hot-key shape — ONE persisted boilerplate
document near-dups (nearly) every incoming doc, so the candidate
frame's id_a is a single dominant key and plain hash partitioning puts
the whole verify join on one reducer. Three configurations over the
SAME `_verify_pair_join` (the one implementation both near-dup paths
call):

- ``aqe_skew_on``  — the session default: AQE splits the oversized
  partition at runtime (SortMergeJoin(skew=true)).
- ``aqe_skew_off`` — the unguarded baseline (what the killer looks
  like).
- ``salted``       — the plan-level guard (n_salts=16), for clusters
  where AQE is off or the join resolves to a shuffled-hash join.

Metrics per config: wall seconds and max/median ROWS PER OUTPUT
PARTITION of the verify join (the deterministic task-skew proxy — one
partition holding ~100% of the rows IS the single straggler task).
Writes BENCH_skew.json at the repo root.

Usage: python tools/skew_stress.py [n_docs]   (default 300000)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hydraide_spark.functions.dedup import _verify_pair_join, shingles  # noqa: E402
from hydraide_spark.session import get_spark  # noqa: E402


def build(spark, n_docs: int):
    docs = spark.range(n_docs + 1).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(
                "terms of service apply to all users of this very large "
                "web site operated by the company in question without "
                "exception or amendment "
            ),
            F.lit("suffix "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    sizes = (
        docs.select(F.col("doc_id"), shingles(F.col("text"), 3).alias("sh"))
        .select(F.col("doc_id"), F.col("sh"), F.size("sh").alias("n_sh"))
        .persist()
    )
    sizes.count()
    # hot persisted doc 0 vs ~96% of the delta (data-dependent key —
    # a literal would constant-fold into a pushed filter)
    cand = (
        spark.range(1, n_docs + 1)
        .select(
            F.when(F.col("id") % 24 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .cast("long")
            .alias("id_a"),
            F.col("id").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .persist()
    )
    cand.count()
    return cand, sizes


def measure(spark, cand, sizes, n_salts: int) -> dict:
    """Metrics are read at the id_a-join boundary — the skew-exposed
    leg (the follow-up id_b join re-shuffles on the uniform id_b and
    would HIDE the straggler). The full verify wall is timed too."""
    pa = sizes.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    if n_salts:
        from hydraide_spark.operators.skew import salted_join

        leg = salted_join(cand, pa, ["id_a"], n_salts=n_salts)
    else:
        leg = cand.join(pa, "id_a")
    g = leg.groupBy(F.spark_partition_id().alias("p")).count()
    t0 = time.monotonic()
    parts = g.collect()
    leg_wall = time.monotonic() - t0
    counts = sorted(r["count"] for r in parts)
    # the plan must come from the frame the action RAN on — an
    # unexecuted sibling frame never finalizes its adaptive plan and
    # reports skew=false even when the split engaged
    plan = g._jdf.queryExecution().executedPlan().toString()

    out = _verify_pair_join(cand, sizes, "doc_id", num=4, den=5, n_salts=n_salts)
    t0 = time.monotonic()
    n = out.count()
    full_wall = time.monotonic() - t0
    return {
        "leg_wall_sec": round(leg_wall, 2),
        "verify_wall_sec": round(full_wall, 2),
        "verified_pairs": n,
        "n_leg_partitions": len(counts),
        "rows_max_partition": counts[-1],
        "rows_median_partition": int(statistics.median(counts)),
        "skew_split_engaged": "skew=true" in plan,
        "worst_over_median": round(
            counts[-1] / max(1, statistics.median(counts)), 1
        ),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("skew_stress", master="local[32]", shuffle_partitions=32)
    # the shingle side is corpus-sized at 100 TB — never broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    cand, sizes = build(spark, n_docs)

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["aqe_default_thresholds"] = measure(spark, cand, sizes, 0)
    # AQE decides skew on COMPRESSED shuffle INPUT bytes; candidate
    # rows are two longs, so the local-scale hot partition (~300 KB
    # compressed) sits far below the 256 MB default even though the
    # JOIN OUTPUT explodes ~50x with shingle payloads — at 100 TB a
    # billion-pair hot key crosses the default on its own. Scale the
    # thresholds to the local bytes to reproduce the at-scale ratio:
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    results["aqe_scaled_thresholds"] = measure(spark, cand, sizes, 0)
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["aqe_skew_off"] = measure(spark, cand, sizes, 0)
    results["salted_16"] = measure(spark, cand, sizes, 16)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    out = {
        "metric": "neardup_verify_join_skew",
        "n_docs": n_docs,
        "note": (
            "single-hot-key verify join (crawl boilerplate shape): "
            "rows_max_partition vs rows_median_partition is the "
            "straggler-task proxy; aqe_skew_on must split the hot "
            "partition (skew_split_engaged) and salted_16 must bound "
            "it in the plan itself."
        ),
        "configs": results,
    }
    with open(os.path.join(_REPO, "BENCH_skew.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
