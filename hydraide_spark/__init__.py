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
"""

__version__ = "0.1.0"
