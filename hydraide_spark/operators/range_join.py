"""Range (interval) join: points joined to the intervals that contain
them — grid-cell blocking + exact verification, never a nested-loop
join.

The reference's time-bounded index reads (`GetByIndex` FromTime/ToTime,
reference ``app/core/hydra/swamp/beacon/beacon.go:1455-1553``) are
point-vs-ONE-range; this operator is the corpus-scale generalization:
every point against a TABLE of ranges. Spark's built-in plan for
``ON ts >= lo AND ts < hi`` is BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) — O(points × intervals), which
dies long before 100 TB.

Blocking: time is cut into fixed cells of ``grain_seconds``. A point
lives in exactly ONE cell; an interval covers ``len/grain + 1`` cells
and is exploded to them. The join is then a plain equi-join on
(keys…, cell) followed by the exact ``lo <= ts < hi`` verify. Because
the point side never replicates and appears in one cell only, every
matching (point, interval) pair surfaces exactly once — no dedup
shuffle. Cost: interval-side replication factor = avg_len/grain + 1;
pick ``grain_seconds`` near the typical interval length to keep it ≤ 2
(the golden query's incident windows use exactly that). Hot (key, cell)
slots are ordinary AQE skew-split work, and the equi-join shape keeps
every Catalyst strategy available (broadcast when the exploded interval
side is small, sort-merge otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import epoch_us


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
    grain_seconds: int = 3600,
) -> DataFrame:
    """Inner-join ``points`` to every row of ``intervals`` whose
    half-open window ``[lo, hi)`` contains ``points[ts_col]`` (and whose
    ``keys`` columns match, when given). Timestamps compare at
    microsecond precision. Empty/inverted windows (hi <= lo) match
    nothing. Non-key column names must be disjoint between the sides.
    """
    g = int(grain_seconds) * 1_000_000
    keys = list(keys or [])

    p = points.withColumn("_cell", F.floor(epoch_us(points, ts_col) / g))
    i = (
        intervals
        # half-open: an empty window covers no cell and matches no point
        .filter(F.col(hi_col) > F.col(lo_col))
        .withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    F.floor(epoch_us(intervals, lo_col) / g),
                    # hi is exclusive: the last covered microsecond is hi-1
                    F.floor((epoch_us(intervals, hi_col) - 1) / g),
                )
            ),
        )
    )
    return (
        p.join(i, on=keys + ["_cell"])
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col)))
        .drop("_cell")
    )
