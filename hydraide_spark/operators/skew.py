"""Skew mitigation: salted equi-join.

AQE's skew-join handling (on in session.py) splits oversized partitions
at runtime, but only for sort-merge joins and only after a shuffle has
already materialized the skew. Salting attacks the skew in the plan:
the big side spreads each hot key over ``n_salts`` sub-keys and the
other side is replicated once per salt, so no single reducer ever owns
a whole hot key. Use when one side has pathological key concentration
(a handful of keys holding a large fraction of rows — the shape word
frequencies and popular entities produce at 100 TB) and the other side
is too large to broadcast but small enough to replicate ``n_salts``×.

The rewrite is semantics-preserving for inner and left joins: every
(left row, right row) pair that agrees on the join keys agrees on
exactly one salt value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` (big, skewed side) with ``other`` (replicated
    side) on columns ``on``, spreading each key over ``n_salts`` shuffle
    sub-keys. ``how`` must keep the replicated side non-preserved
    ('inner' or 'left'): an outer/right join would duplicate unmatched
    replicated rows once per salt."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    on = list(on)
    # deterministic, uniform, cheap: row id modulo the salt space.
    # (Salting by a hash of the join key would defeat the point — all
    # rows of a hot key must NOT share a salt.)
    left = skewed.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    right = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return left.join(right, on + [SALT_COL], how).drop(SALT_COL)
