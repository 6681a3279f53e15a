"""hydraide_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hydraide/hydraide (the reference engine),
re-expressed Spark-first.

The reference is a structure-first, namespace-sharded KV engine with a
protobuf filter algebra (see SURVEY.md). This package maps those
capabilities onto DataFrames + Spark SQL + Catalyst + Structured
Streaming:

- ``model``     — namespace addressing (Sanctuary/Realm/Swamp, island
                  hashing) and the treasure row schema.
- ``query``     — the FilterGroup predicate algebra -> Column translation
                  and ordered-index reads (sort / offset / limit /
                  time-bounds).
- ``operators`` — read surface (get / get-by-index / stream / from-many /
                  profile), mutation surface (set modes / delete /
                  increment / patch / uint32-set ops), claims
                  (shift / patch-expired / cap).
- ``functions`` — geo, vector, phrase/word-index, text analysis, dedup,
                  similarity search, multimodal column plumbing.
- ``sources``   — parquet-backed treasure store with change-event log.
- ``streaming`` — Subscribe (snapshot-then-live), SubscribeToInfo,
                  TTL-queue claim loops on Structured Streaming.
- ``plans``     — plan inspection helpers (pushdown / broadcast asserts).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.

The stable import surface (README "Quickstart") re-exports here, so one
``import hydraide_spark as hs`` reaches every family:

- session:   ``hs.get_spark``
- store:     ``hs.TreasureStore``, ``hs.load_table``, ``hs.load_tables``
- naming:    ``hs.Name``, ``hs.island_id_col``
- query:     ``hs.query`` (And/Or/Not/Cmp/Op/Phrase/VectorSim/Geo...,
             ``translate``), ``hs.Index``
- operators: ``hs.operators`` (get/set/patch/claims/locks/telemetry)
- pipeline:  ``hs.functions`` (text/dedup/ANN/graph/sketches/sampling)
- streaming: ``hs.streaming`` (subscribe, TTL loops, rollup maintenance)
- plans:     ``hs.plans`` (pushdown/broadcast/shuffle assertions)

Importing this package never requires an active SparkContext (the
driver-contract rule): every re-export is a plain def/class.
"""

from . import functions, model, operators, plans, query, sources, streaming
from .model import Name, island_id, island_id_col, treasure_schema
from .operators import (
    Cap,
    CasLeaseLockManager,
    FileLeaseLockManager,
    LockManager,
    PatchKind,
    PatchOp,
    QueryStatsCollector,
)
from .query import Index, IndexOrder, IndexType, translate
from .session import get_spark
from .sources import TABLES, load_table, load_tables
from .sources.store import TreasureStore

__all__ = [
    "Cap",
    "CasLeaseLockManager",
    "FileLeaseLockManager",
    "Index",
    "IndexOrder",
    "IndexType",
    "LockManager",
    "Name",
    "PatchKind",
    "PatchOp",
    "QueryStatsCollector",
    "TABLES",
    "TreasureStore",
    "functions",
    "get_spark",
    "island_id",
    "island_id_col",
    "load_table",
    "load_tables",
    "model",
    "operators",
    "plans",
    "query",
    "sources",
    "streaming",
    "translate",
    "treasure_schema",
]

__version__ = "0.2.0"
