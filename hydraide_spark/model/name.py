"""Namespace addressing: Sanctuary / Realm / Swamp and island hashing.

Reference semantics (hydraide): a Swamp is addressed by the 3-level name
``Sanctuary/Realm/Swamp``; its physical placement is a deterministic
hash slot ("island") computed client-side as
``xxhash64(sanctuary + "/" + realm + "/" + swamp) % N + 1`` (1-based)
— see reference ``sdk/go/hydraidego/name/name.go:150-190`` and
``proto/hydraide.proto:881-910``.

Spark mapping: deterministic hash addressing IS Spark's shuffle
primitive. ``island_id_col`` exposes the same function as a Column so a
logical table of many swamps can be hash-partitioned / bucketed on it
(``df.repartition(n, island_id_col(...))``), giving the same
co-location property the reference gets from island routing, at any
cluster size. ``F.xxhash64`` is the same hash family the reference uses,
so partition assignment is stable across engines and runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F

DEFAULT_ISLAND_SPACE = 1000


@dataclass(frozen=True)
class Name:
    """A fully-qualified swamp name. Immutable, hash-addressable."""

    sanctuary: str
    realm: str
    swamp: str

    def path(self) -> str:
        return f"{self.sanctuary}/{self.realm}/{self.swamp}"

    def island_id(self, space: int = DEFAULT_ISLAND_SPACE) -> int:
        return island_id(self.path(), space)


def island_id(path: str, space: int = DEFAULT_ISLAND_SPACE) -> int:
    """Deterministic 1-based island slot for a swamp path (driver-side).

    Uses xxhash64 to match the Column-side expression; computed through a
    throwaway Spark-free xxhash would add a dependency, so this helper is
    resolved lazily through Spark when a session exists, else via a pure
    Python fallback (FNV-1a) clearly marked as local-only.
    """
    try:  # pragma: no cover - exercised when a session is active
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            row = spark.range(1).select(
                (F.pmod(F.xxhash64(F.lit(path)), F.lit(space)) + 1).alias("i")
            ).head()
            return int(row["i"])
    except Exception:
        pass
    # Pure-python fallback (FNV-1a 64) — only for offline tooling; the
    # engine itself always addresses through the Column expression below.
    h = 0xCBF29CE484222325
    for b in path.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return (h % space) + 1


def island_id_col(
    sanctuary: Column | str = "sanctuary",
    realm: Column | str = "realm",
    swamp: Column | str = "swamp",
    space: int = DEFAULT_ISLAND_SPACE,
) -> Column:
    """Island slot as a Column — the engine's partitioning expression.

    ``pmod`` keeps the slot non-negative (xxhash64 is signed in Spark);
    1-based to match the reference's contract.
    """
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    path = F.concat_ws("/", c(sanctuary), c(realm), c(swamp))
    return (F.pmod(F.xxhash64(path), F.lit(space)) + 1).alias("island_id")
