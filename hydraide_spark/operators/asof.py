"""As-of join: for each left row, the most recent right row at-or-before
(backward) or earliest at-or-after (forward) its timestamp, per key.

The reference has no join surface at all (SURVEY §2.3) — its users do
this client-side with per-key reads; an as-of join is the canonical
time-series capability a training-data/event pipeline needs that Spark
also lacks as a built-in (SPARK-22947 never merged).

Implementation is the union + ordered-window formulation, NOT a range
join: tag left/right rows, union them, and run ``last(value, ignorenulls)``
over a per-key window ordered by (ts, side). That is ONE shuffle on the
key (the same shuffle either input would need anyway), zero candidate
explosion, and no range-join quadratic blowup on hot keys — for each
left row the window scan-carries exactly the latest right payload seen
so far. At 100 TB this is a single sort-merge pass per key partition;
skewed keys split under AQE like any other sort/window.

A join+filter+row_number alternative shuffles BOTH inputs, multiplies
candidates by every (left, right) in-range pair before ranking, and
dies on keys with many right rows; the union-window form is what
pandas ``merge_asof`` does per group, expressed distributively.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    direction: str = "backward",
    suffix: str = "_asof",
    matched_ts_col: str = "asof_ts",
    tolerance_seconds: Optional[float] = None,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join. Every left row is returned; matched right
    ``value_cols`` arrive as ``<col><suffix>`` (null when no right row
    qualifies), plus the matching right timestamp as ``matched_ts_col``.

    ``direction='backward'``: match the greatest right ts <= left ts
    (ties: the right row sorts before the left row at equal ts, so
    equal-ts rights DO match — pandas merge_asof semantics).
    ``direction='forward'``: smallest right ts >= left ts.
    ``tolerance_seconds``: unmatch rows whose gap exceeds the bound.
    ``right_tiebreak``: right columns ordering duplicates of
    (key, right_ts) — the greatest tuple wins; without it the winner
    among exact-duplicate timestamps is partition-order-dependent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    left_cols = left.columns
    vals = list(value_cols)
    tbs = list(right_tiebreak)

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in vals],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}") for c in tbs],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in vals],
        *[F.col(c).alias(f"_tb_{c}") for c in tbs],
    )
    u = l_tagged.unionByName(r_tagged)

    # among duplicate (key, ts, side=right) rows the LAST wins, so the
    # tiebreak sorts ascending (nulls first keeps left rows, whose
    # tiebreak is null, ordered purely by (_ts, _side)).
    tb_order = [F.col(f"_tb_{c}").asc_nulls_first() for c in tbs]
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), *tb_order]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), *tb_order]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched_ts = F.last(
        F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
    ).over(w)
    carried = u.select(
        "*",
        matched_ts.alias("_mts"),
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in vals
        ],
    ).filter(F.col("_side") == 1)

    in_tolerance = F.lit(True)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - F.col("_mts").cast("double")
        )
        in_tolerance = F.col("_mts").isNotNull() & (gap <= F.lit(tolerance_seconds))

    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left_cols]
    out_cols.append(
        F.when(in_tolerance, F.col("_mts")).alias(matched_ts_col)
    )
    out_cols.extend(
        F.when(in_tolerance, F.col(f"_m_{c}")).alias(f"{c}{suffix}") for c in vals
    )
    return carried.select(*out_cols)
