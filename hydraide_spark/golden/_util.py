"""Shared helpers for golden queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: per-process memo of the reader METADATA for the immutable sf_dir
#: fixture tables (r16, guide §1.2/§7.3 driver-side planning cost):
#: ``load_table`` costs ~0.10-0.15 s PER CALL, ~2/3 of it footer schema
#: inference + the pyarrow timestamp classification — and the bench's
#: 240 goldens load ~2 tables each, so tens of seconds of pure
#: plan-build per pass re-derive byte-identical metadata. The memo
#: holds (path, schema, nanos-columns) ONLY — pure-Python values, no
#: JVM refs — and every ``t()`` call still issues a FRESH
#: ``spark.read.schema(...).parquet(path)`` (~0.03-0.07 s), so each
#: returned frame has its own expression IDs. (Memoizing the FRAME
#: itself broke self-join disambiguation: a query that loads one table
#: twice — directly or via a derived frame like partsupp — then shares
#: expression IDs across both join sides and Catalyst raises
#: AMBIGUOUS_SELF_JOIN; tpch_q2_min_cost_supplier caught it.) Every
#: action still lists and scans the parquet inputs — this is the
#: n_rows_memo/input-constant convention, not result caching.
from weakref import WeakKeyDictionary

from ..sources.tables import _ensure_nanos_conf, _timestamp_columns

_TABLE_META_MEMO: dict = {}

#: sessions whose nanosAsLong/inferTimestampNTZ confs are already set
#: (keyed weakly — a stopped driver session must not mask its
#: successor, which needs the confs set again).
_CONF_SESSIONS: "WeakKeyDictionary" = WeakKeyDictionary()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    if spark not in _CONF_SESSIONS:
        _ensure_nanos_conf(spark)
        _CONF_SESSIONS[spark] = True
    key = (sf_dir, name)
    meta = _TABLE_META_MEMO.get(key)
    if meta is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            path = os.path.join(sf_dir, name)
        raw = spark.read.parquet(path)
        nanos, _ = _timestamp_columns(path)
        meta = (path, raw.schema, tuple(nanos))
        _TABLE_META_MEMO[key] = meta
    path, schema, nanos = meta
    df = spark.read.schema(schema).parquet(path)
    for col in nanos:
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


#: per-process memo of INPUT CONSTANTS that are pure functions of the
#: immutable sf_dir fixtures (row counts feeding synthetic-graph
#: moduli, the point-lookup query vector) — the vectors._model_memo
#: convention. These cache one bounded scalar job per (sf_dir, args),
#: never any query RESULT: every invocation still computes its output
#: from the parquet inputs.
_STAT_MEMO: dict = {}


def n_rows_memo(spark: SparkSession, sf_dir: str, name: str) -> int:
    key = ("n_rows", sf_dir, name)
    if key not in _STAT_MEMO:
        _STAT_MEMO[key] = t(spark, sf_dir, name).count()
    return _STAT_MEMO[key]


def stat_memo(key: tuple, compute):
    """Memo an INPUT CONSTANT that is a pure function of the immutable
    sf_dir fixtures (same convention and same line as
    :func:`n_rows_memo`: corpus statistics feeding request parameters
    may memo; anything that IS a query's output may not)."""
    if key not in _STAT_MEMO:
        _STAT_MEMO[key] = compute()
    return _STAT_MEMO[key]


#: per-process memo of RESULT-FRAME PLANS for goldens whose build phase
#: is pure DataFrame construction (r16 — VERDICT item 1, guide §7.3
#: "very large plans can spend minutes in planning"). A lazy DataFrame
#: is a PLAN, never data: every action on the memoized frame still
#: computes the query's output from the parquet inputs (through the
#: same pin_latest cache boundaries a fresh build would create), so the
#: models-may-memo/results-may-not line is untouched — this memoizes
#: strictly LESS than a model memo does (zero values, only an analyzed
#: operator tree). What it saves is the per-call py4j round trips AND
#: the JVM re-analysis of large literal subtrees (langid's 5x2048
#: decimal model re-analyzed by every op stacked above it: ~1-3 s per
#: call on the worst builders).
#:
#: Opt-in is deliberately NARROW. A golden may use frame_memo ONLY if
#: its build phase runs no action whose effect or result feeds the
#: returned plan as anything but a memoized MODEL/INPUT CONSTANT
#: (bpe_merge_rules' training, PRF's round-1 collect, the patch walks,
#: mmr's greedy, driver-replay cluster/rank collects, increment's
#: hit-key set, and scratch-file writers are all excluded — skipping
#: those on repeat calls would memoize the OUTPUT).
#: Shared pin sites are safe: the build's pin_latest calls are
#: CAPTURED (functions/_cache.capture_pins) and RE-PINNED on every
#: memo hit, so a memoized golden is indistinguishable from a rebuild
#: for site rotation — the _same_plan eviction guard keeps its deps
#: warm exactly as if it still re-pinned per call.
#: Keyed per applicationId so a restarted session rebuilds cleanly.
_FRAME_MEMO: dict = {}


def frame_memo(spark: SparkSession, key: tuple, build) -> DataFrame:
    from ..functions._cache import capture_pins, pin_latest

    k = (spark.sparkContext.applicationId,) + tuple(key)
    hit = _FRAME_MEMO.get(k)
    if hit is None:
        with capture_pins() as pins:
            frame = build()
        hit = _FRAME_MEMO[k] = (frame, pins)
    else:
        for site, deps, mg in hit[1]:
            pin_latest(site, *deps, max_generations=mg)
    return hit[0]


def memo_golden(name: str):
    """Decorator form of :func:`frame_memo` for goldens whose whole
    body is pure plan construction (see the opt-in rules above).
    Stacks UNDER ``@golden`` so the registry holds the memoizing
    wrapper."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark, sf_dir):
            return frame_memo(spark, (name, sf_dir), lambda: fn(spark, sf_dir))

        return wrapped

    return deco


def parallelize_small(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Spread a small-file input across the cluster before compute-heavy
    per-row work (hashing, UDF batches). Local parquet fixtures arrive
    in 1-3 partitions (one row group per file), which would pin the
    expensive pipelines to as many cores; at production scale the file
    count provides this parallelism and the repartition collapses to a
    no-op cost relative to the downstream work.

    ``cap`` bounds the fan-out for Arrow/pandas stages: each partition
    is a Python worker whose startup+import cost dwarfs trivial per-row
    work, so batch-heavy UDF stages want fewer, larger Arrow batches."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if cap is not None:
        target = min(target, cap)
    return df.repartition(target)


def big(c: Column | str) -> Column:
    """Cast to BIGINT — canonical integer width for oracle comparison."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("bigint")


def dec(c: Column | str, scale: int = 2, precision: int = 28) -> Column:
    """Canonical decimal for exact, order-independent aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def dbl(c: Column) -> Column:
    return c.cast("double")


def orders_as_swamp(df: DataFrame) -> DataFrame:
    """View the TPC-H orders table as a treasure swamp: string key +
    value columns + nullable created_at (every 10th row unstamped, to
    exercise the §1.4 null-timestamp-exclusion rule)."""
    return df.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_orderkey") % 10 != 0, F.col("o_orderdate")).alias("created_at"),
    )


ORDERS_SWAMP_SQL = """
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           o_totalprice AS totalprice,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           CASE WHEN o_orderkey % 10 <> 0 THEN o_orderdate END AS created_at
    FROM orders
"""
