"""Ordered index reads: sort + time-bounds + offset/limit.

Reference semantics (``proto/hydraide.proto:1349-1431``, beacon sorts
``app/core/hydra/swamp/beacon/beacon.go:1622-1998``): an Index names a
sort domain — KEY, one of the 3 metadata timestamps, or the value — with
ASC/DESC order, offset (``From``) / ``Limit`` pagination, and, for the
timestamp indexes, an optional ``[from_time, to_time)`` bound
(from-inclusive / to-exclusive per reference ``hydraidego.go:142-143``).

Two load-bearing behaviors reproduced here:

1. **Null-timestamp exclusion** (SURVEY.md §1.4): a time-based index
   only contains rows that carry that timestamp (reference
   ``swamp.go:3090-3120`` filters ``CreatedAt==0`` before building the
   beacon). So any timestamp-ordered read implicitly prepends
   ``WHERE ts IS NOT NULL`` — encoded here, never left to callers.

2. **Deterministic pagination**: the reference's beacons are total
   orders (ties broken by insertion into a stable array). A distributed
   sort needs an explicit tiebreaker for offset/limit to be
   deterministic, so every Index sort appends ``key`` as the final sort
   column.

Scale note: the reference builds each beacon lazily in RAM per swamp;
Spark's analogue is a sort whose *bounds* prune first — the time-range
predicate lands on the Parquet scan (row-group min/max pruning replaces
the beacon's binary search), and TakeOrderedAndProject handles
small-limit top-k without a full sort.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from enum import Enum
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


class IndexType(Enum):
    KEY = "key"
    CREATION_TIME = "created_at"
    UPDATE_TIME = "updated_at"
    EXPIRATION_TIME = "expired_at"
    VALUE = "value"  # column name supplied separately


class IndexOrder(Enum):
    ASC = "asc"
    DESC = "desc"


_TIME_INDEXES = {
    IndexType.CREATION_TIME,
    IndexType.UPDATE_TIME,
    IndexType.EXPIRATION_TIME,
}


@dataclass(frozen=True)
class Index:
    index_type: IndexType = IndexType.KEY
    order: IndexOrder = IndexOrder.ASC
    value_column: Optional[str] = None  # for IndexType.VALUE
    offset: int = 0  # reference `From`
    limit: Optional[int] = None
    from_time: Optional[datetime] = None  # inclusive
    to_time: Optional[datetime] = None  # exclusive
    key_column: str = "key"

    def sort_column_name(self) -> str:
        if self.index_type is IndexType.VALUE:
            if not self.value_column:
                raise ValueError("IndexType.VALUE requires value_column")
            return self.value_column
        if self.index_type is IndexType.KEY:
            return self.key_column
        return self.index_type.value

    def sort_columns(self) -> list[Column]:
        c = F.col(self.sort_column_name())
        primary = c.asc() if self.order is IndexOrder.ASC else c.desc()
        cols = [primary]
        if self.sort_column_name() != self.key_column:
            # stable tiebreaker for deterministic pagination
            cols.append(F.col(self.key_column).asc())
        return cols

    def bounds_predicate(self) -> Optional[Column]:
        preds: list[Column] = []
        c = F.col(self.sort_column_name())
        if self.index_type in _TIME_INDEXES:
            # §1.4: time index only contains stamped rows
            preds.append(c.isNotNull())
        if self.from_time is not None:
            preds.append(c >= F.lit(self.from_time))
        if self.to_time is not None:
            preds.append(c < F.lit(self.to_time))
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        """scan -> bound -> sort -> offset/limit, declaratively."""
        pred = self.bounds_predicate()
        if pred is not None:
            df = df.filter(pred)
        df = df.orderBy(*self.sort_columns())
        if self.offset:
            df = df.offset(self.offset)
        if self.limit is not None:
            df = df.limit(self.limit)
        return df
