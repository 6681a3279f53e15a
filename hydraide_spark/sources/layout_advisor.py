"""Store-layout advisor (r12 VERDICT #8): recommend flat vs bucketed
manifest layout from a store's RECORDED workload, with the measured
prune-factor rule as the formula.

Background (BENCH_scale30, SCALE.md §r11-bucketed): the bucketed
manifest layout makes a fixed-size point-write batch O(batch) —
the write rewrites only ``min(batch_keys, n_buckets)`` buckets, so its
cost relative to a flat whole-version rewrite is the PRUNE FACTOR
``min(1, batch_keys / n_buckets)`` (set_100 at ×30: 19.6 s flat →
5.3 s bucketed). The price is on bulk/scan paths: a full read resolves
``n_buckets`` bucket dirs' files instead of one flat dir (snapshot
read 0.31 s → 2.5 s at 1,024 buckets — ~7× listing/small-file
overhead, the measured constant below).

The advisor weighs a recorded history of write batch sizes and
external scans under both layouts and recommends the cheaper one,
plus the concrete migration call. Workload recording is the opt-in
``TreasureStore(track_workload=True)`` (one count job per
DataFrame-keyed batch); the advisor itself runs zero Spark jobs.
"""

from __future__ import annotations

from typing import Sequence

#: expected rows per bucket — the same sizing rule the LSM state
#: tables and the scale stress use (tools/store_stress.py
#: auto_store_buckets): buckets ≈ n / 4096, next power of two
BUCKET_TARGET_ROWS = 4096

#: measured full-scan overhead of the bucketed layout per bucket,
#: normalized so 1,024 buckets ≈ 8× a flat read (BENCH_scale30:
#: store_snapshot_read 0.31 s flat vs 2.5 s at 1,024 buckets) —
#: listing + per-small-file footer cost, linear in bucket count
SCAN_PENALTY_PER_BUCKET = 7.0 / 1024.0


def auto_store_buckets(n_rows: int) -> int:
    """Bucket count ∝ store size (bucket ≈ BUCKET_TARGET_ROWS rows):
    the write prune for a fixed-size batch is then constant as the
    store grows — the r11 manifest layout's whole point."""
    return 1 << max(4, (int(n_rows) // BUCKET_TARGET_ROWS).bit_length())


def recommend_layout(
    write_batches: Sequence[int],
    n_scans: int,
    n_rows: int,
    n_buckets: "int | None" = None,
) -> dict:
    """The pure decision. Relative cost of each recorded op under the
    bucketed layout, in units of the flat layout's cost for that op:

    - a write batch of ``k`` keys costs ``min(1, k / n_buckets)``
      (the measured prune factor — it rewrites only the touched
      buckets' rows),
    - a full scan costs ``1 + SCAN_PENALTY_PER_BUCKET * n_buckets``.

    Bucketed wins when the summed relative cost is below the flat
    total (= number of ops). Returns the recommendation, the sized
    bucket count, both totals, and the migration call to run."""
    nb = int(n_buckets) if n_buckets else auto_store_buckets(n_rows)
    write_flat = float(len(write_batches))
    write_bucketed = sum(min(1.0, int(k) / nb) for k in write_batches)
    scan_flat = float(n_scans)
    scan_bucketed = n_scans * (1.0 + SCAN_PENALTY_PER_BUCKET * nb)
    flat_total = write_flat + scan_flat
    bucketed_total = write_bucketed + scan_bucketed
    bucketed_wins = bucketed_total < flat_total
    mean_prune = (write_bucketed / write_flat) if write_batches else 1.0
    return {
        "recommendation": "bucketed" if bucketed_wins else "flat",
        "n_buckets": nb if bucketed_wins else None,
        "cost_flat": round(flat_total, 3),
        "cost_bucketed": round(bucketed_total, 3),
        "mean_prune_factor": round(mean_prune, 4),
        "n_writes": len(write_batches),
        "n_scans": int(n_scans),
        "migration": (
            f"store.migrate_layout(n_buckets={nb})"
            if bucketed_wins
            else "store.migrate_layout(n_buckets=None)"
        ),
    }
