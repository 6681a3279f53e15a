"""Treasure row schema: key + typed value + optional metadata.

Reference semantics: one Treasure = string key + exactly one typed value
+ optional metadata (created_at/by, updated_at/by, expired_at); the
server never auto-stamps metadata, so every metadata column is nullable
and NULL-ness is semantically load-bearing (a row with NULL created_at
is invisible to creation-time-ordered reads — reference
``app/core/hydra/swamp/swamp.go:3090-3120``; encoded here and enforced
by ``hydraide_spark.query.index``).

The value is either a typed scalar column (catalog single-value model),
a StructType column (map-body model — fields natively addressable, which
is the whole point of map-body in the reference), or a wide row
(profile model: one column per field). Spark's schema-on-write replaces
the reference's struct-tag reflection.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Standard metadata columns, all nullable by contract.
TREASURE_META_COLUMNS: list[tuple[str, T.DataType]] = [
    ("created_at", T.TimestampType()),
    ("created_by", T.StringType()),
    ("updated_at", T.TimestampType()),
    ("updated_by", T.StringType()),
    ("expired_at", T.TimestampType()),
]


def treasure_schema(value_fields: list[T.StructField]) -> T.StructType:
    """Schema for one logical swamp table.

    ``(sanctuary, realm, swamp)`` identify the namespace (partition
    columns at scale), ``key`` is unique per swamp, ``value_fields``
    carry the typed payload, metadata columns are appended nullable.
    """
    fields = [
        T.StructField("sanctuary", T.StringType(), False),
        T.StructField("realm", T.StringType(), False),
        T.StructField("swamp", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        *value_fields,
    ]
    for name, dtype in TREASURE_META_COLUMNS:
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)
