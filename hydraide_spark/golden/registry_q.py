"""Golden query: swamp-pattern registry routing (the reference's
``RegisterSwamp`` admin surface, proto:43-49,803-856)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.registry import SwampRegistry, SwampSettings
from . import golden
from ._util import big, t


@golden(
    "swamp_pattern_routing",
    oracle="""
    SELECT o_orderstatus AS swamp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE o_orderstatus WHEN 'O' THEN 'tpch/orders/O'
                              ELSE 'tpch/orders/*' END AS matched_pattern,
           CAST(CASE o_orderstatus WHEN 'O' THEN 300 ELSE 60 END AS BIGINT)
             AS close_after_idle_sec,
           CAST(CASE o_orderstatus WHEN 'O' THEN 5 ELSE 2 END AS BIGINT)
             AS write_interval_sec,
           o_orderstatus = 'O' AS in_memory
    FROM orders GROUP BY o_orderstatus
    """,
)
def swamp_pattern_routing(spark, sf_dir):
    """RegisterSwamp-pattern resolution driving a read: orders viewed
    as per-status swamps under ``tpch/orders/<status>``; the registry
    holds an exact pattern for the 'O' swamp plus realm- and
    sanctuary-level wildcards, and each swamp's lifecycle settings come
    from its MOST SPECIFIC match (deterministic, unlike the reference's
    map-iteration pick, settings.go:252-263). The oracle replays the
    routing as literals — proving exact beats swamp-wildcard beats
    full-wildcard — against the same grouped count. The swamp list is
    DECLARED (the registered namespace is the routing input, exactly as
    the reference's RegisterSwamp client declares its swamps up front) —
    registry resolution never scans the data to discover its keys, so at
    100 TB the data path stays one grouped aggregate with no prior
    discovery pass; unknown statuses would surface as NULL-settings rows
    rather than silently widening the route table."""
    reg = SwampRegistry()
    reg.register(
        SwampSettings(
            "tpch/orders/O",
            in_memory=True,
            close_after_idle_sec=300,
            write_interval_sec=5,
        )
    )
    reg.register(
        SwampSettings("tpch/orders/*", close_after_idle_sec=60, write_interval_sec=2)
    )
    reg.register(
        SwampSettings("tpch/*/*", close_after_idle_sec=10, write_interval_sec=1)
    )

    orders = t(spark, sf_dir, "orders")
    # Declared swamp list (the TPC-H order-status domain) — NOT discovered
    # by scanning the table; see docstring.
    statuses = ["F", "O", "P"]
    resolved = {s: reg.resolve(f"tpch/orders/{s}") for s in statuses}

    def case(attr, cast=None):
        col = None
        for s in statuses:
            v = getattr(resolved[s], attr)
            branch = F.when(F.col("o_orderstatus") == s, F.lit(v))
            col = branch if col is None else col.when(F.col("o_orderstatus") == s, F.lit(v))
        return col.cast(cast) if cast else col

    return (
        orders.groupBy(F.col("o_orderstatus").alias("swamp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("o_orderstatus", F.col("swamp"))
        .select(
            "swamp",
            big("n").alias("n"),
            case("pattern").alias("matched_pattern"),
            case("close_after_idle_sec", "bigint").alias("close_after_idle_sec"),
            case("write_interval_sec", "bigint").alias("write_interval_sec"),
            case("in_memory").alias("in_memory"),
        )
    )
