"""Golden query registry — the correctness-gate surface.

Every implemented operator from SURVEY.md §2 registers at least one
golden query here: a ``(spark, sf_dir) -> DataFrame`` callable plus (for
SQL-expressible ops) an equivalent ANSI-SQL oracle string that DuckDB
runs over the same parquet tables. The driver hash-compares the two at
sf=0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides;
- integer outputs are cast to BIGINT on both sides (engine-default
  widths differ);
- double aggregation goes through DECIMAL (exact, order-independent)
  and is cast back to DOUBLE at the end, so parallel vs serial
  summation produces bit-identical results;
- result sets are made deterministic (explicit tiebreakers on every
  sort that feeds an offset/limit).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def golden(name: str, oracle: Optional[str] = None):
    """Register a golden query (and its DuckDB oracle, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import read_ops  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import predicates  # noqa: F401
    from . import documents  # noqa: F401
    from . import sets_exists  # noqa: F401
    from . import mutations  # noqa: F401
    from . import mutations2  # noqa: F401
    from . import dedup_text  # noqa: F401
    from . import vectors  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import windows  # noqa: F401
    from . import relational  # noqa: F401
    from . import sketches  # noqa: F401
    _LOADED = True
