"""Golden queries: the keyed/ordered read surface (SURVEY.md §2.1, §2.6).

Covers: Get, GetAll, GetByKeys (include/exclude/keys-only), GetByIndex
(sort + offset/limit + time bounds + §1.4 null-timestamp rule),
GetByIndexStream (filter + order + MaxResults), FromMany fan-in,
profile reads, pagination.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ..operators import read as R
from ..query import Cmp, And, Index, IndexOrder, IndexType, Op
from . import golden
from ._util import ORDERS_SWAMP_SQL, big, orders_as_swamp, t

_GET_KEYS = ["1", "2", "3", "7", "32", "128", "999999999"]


@golden(
    "get_point_read",
    oracle=f"""
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           o_totalprice AS totalprice, o_orderstatus AS status
    FROM orders
    WHERE CAST(o_orderkey AS VARCHAR) IN ({",".join(f"'{k}'" for k in _GET_KEYS)})
    """,
)
def get_point_read(spark, sf_dir):
    """Reference `Get` (gateway.go:334-441): multi-point read by key;
    missing keys silently absent."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    return R.get(swamp, _GET_KEYS).select("key", "totalprice", "status")


@golden(
    "get_all_scan",
    oracle="""
    SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
    FROM region
    """,
)
def get_all_scan(spark, sf_dir):
    """Reference `GetAll`: full-swamp scan."""
    return R.get_all(t(spark, sf_dir, "region")).select(
        big("r_regionkey").alias("r_regionkey"), "r_name"
    )


@golden(
    "get_by_keys_batch",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS key
    FROM orders
    WHERE o_orderkey BETWEEN 1 AND 200 AND o_orderkey % 2 = 1
      AND CAST(o_orderkey AS VARCHAR) NOT IN ('7','21')
    """,
)
def get_by_keys_batch(spark, sf_dir):
    """Reference `GetByKeys` (proto:1447-1483): large batch keyed read
    (semi-join path), exclude set, keys-only projection."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    keys = [str(k) for k in range(1, 201, 2)]  # 100 keys -> isin path
    return R.get_by_keys(swamp, keys, keys_only=True, exclude_keys=["7", "21"])


@golden(
    "get_by_keys_semijoin",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS key, o_totalprice AS totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 1 AND 1000
    """,
)
def get_by_keys_semijoin(spark, sf_dir):
    """Same read with a 1000-key list: crosses ISIN_THRESHOLD, so the
    plan switches to a broadcast left-semi join — the strategy that
    survives million-key batch reads at 100 TB."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    keys = [str(k) for k in range(1, 1001)]
    return R.get_by_keys(swamp, keys).select("key", "totalprice")


@golden(
    "get_by_index_paged",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL})
    SELECT key, totalprice FROM swamp
    ORDER BY totalprice DESC, key ASC
    LIMIT 25 OFFSET 10
    """,
)
def get_by_index_paged(spark, sf_dir):
    """Reference `GetByIndex` (beacon ordered walk + From/Limit): value
    index DESC with offset pagination; deterministic via key tiebreaker."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    idx = Index(
        index_type=IndexType.VALUE,
        value_column="totalprice",
        order=IndexOrder.DESC,
        offset=10,
        limit=25,
    )
    return R.get_by_index(swamp, idx).select("key", "totalprice")


@golden(
    "get_by_index_time_range",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL})
    SELECT key, created_at FROM swamp
    WHERE created_at IS NOT NULL
      AND created_at >= TIMESTAMP '1996-01-01 00:00:00'
      AND created_at <  TIMESTAMP '1996-03-01 00:00:00'
    ORDER BY created_at ASC, key ASC
    LIMIT 100
    """,
)
def get_by_index_time_range(spark, sf_dir):
    """Creation-time index with [from, to) bounds. Exercises the §1.4
    rule: rows with NULL created_at are invisible to this index (the
    IS NOT NULL is implicit in the engine, explicit in the oracle)."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    idx = Index(
        index_type=IndexType.CREATION_TIME,
        order=IndexOrder.ASC,
        from_time=datetime(1996, 1, 1),
        to_time=datetime(1996, 3, 1),
        limit=100,
    )
    return R.get_by_index(swamp, idx).select("key", "created_at")


@golden(
    "index_null_timestamp_excluded",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_indexed
    FROM swamp WHERE created_at IS NOT NULL
    """,
)
def index_null_timestamp_excluded(spark, sf_dir):
    """§1.4 as a direct assertion: a creation-time-ordered scan sees
    exactly the stamped rows (reference swamp.go:3090-3120)."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    idx = Index(index_type=IndexType.CREATION_TIME)
    return R.get_by_index(swamp, idx).agg(F.count(F.lit(1)).alias("n_indexed"))


@golden(
    "stream_filtered_ordered",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL})
    SELECT key, totalprice, status FROM swamp
    WHERE key NOT IN ('5','10') AND status = 'O' AND totalprice > 150000
    ORDER BY totalprice DESC, key ASC
    LIMIT 50
    """,
)
def stream_filtered_ordered(spark, sf_dir):
    """Reference `GetByIndexStream` (gateway.go:632-752): exclude-keys ->
    FilterGroup -> ordered walk -> MaxResults, in one declarative plan."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    idx = Index(index_type=IndexType.VALUE, value_column="totalprice", order=IndexOrder.DESC)
    filt = And([Cmp("status", Op.EQ, "O"), Cmp("totalprice", Op.GT, 150000.0)])
    return R.get_by_index_stream(
        swamp, idx, filt=filt, max_results=50, exclude_keys=["5", "10"]
    ).select("key", "totalprice", "status")


@golden(
    "stream_from_many",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL}),
    tagged AS (
      SELECT key, totalprice, status AS source_swamp FROM swamp
      WHERE status IN ('O','F') AND totalprice > 100000
    )
    SELECT key, totalprice, source_swamp FROM tagged
    ORDER BY totalprice DESC, key ASC
    LIMIT 40
    """,
)
def stream_from_many(spark, sf_dir):
    """Reference `GetByIndexStreamFromMany` (gateway.go:756-908): N
    per-swamp queries fanned in with a source tag and a global cap."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders"))
    sources = [
        (s, swamp.filter(F.col("status") == s).drop("status"))
        for s in ("O", "F")
    ]
    idx = Index(index_type=IndexType.VALUE, value_column="totalprice", order=IndexOrder.DESC)
    out = R.get_by_index_stream_from_many(
        sources, idx, filt=Cmp("totalprice", Op.GT, 100000.0), max_results=40
    )
    return out.select("key", "totalprice", "source_swamp")


@golden(
    "profile_read",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS key, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 9000 AND c_mktsegment = 'BUILDING'
    """,
)
def profile_read_q(spark, sf_dir):
    """Reference profile mode (`GetStream`, proto:2916-2954): per-field
    Treasures collapse to a wide row; TreasureKey-targeted filters are
    plain column predicates; Keys[] projection is a select."""
    prof = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("key"),
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    filt = And([Cmp("c_acctbal", Op.GT, 9000.0), Cmp("c_mktsegment", Op.EQ, "BUILDING")])
    return R.profile_read(prof, filt=filt, fields=["c_name", "c_acctbal"])


@golden(
    "stream_from_many_single_scan",
    oracle=f"""
    WITH swamp AS ({ORDERS_SWAMP_SQL}),
    tagged AS (
      SELECT key, totalprice, status AS source_swamp FROM swamp
      WHERE status IN ('O','F') AND totalprice > 100000
    )
    SELECT key, totalprice, source_swamp FROM tagged
    ORDER BY totalprice DESC, key ASC
    LIMIT 40
    """,
)
def stream_from_many_single_scan(spark, sf_dir):
    """The single-scan FromMany fast path under the SAME oracle as
    stream_from_many: one partition-pruned scan + per-swamp windows
    replaces N scans + N sorts, and the driver gate itself certifies
    the rewrite is semantics-preserving (same trick as the reference's
    bucket-vs-bypass byte-identical invariant, query-engine.md:86)."""
    swamp = orders_as_swamp(t(spark, sf_dir, "orders")).withColumnRenamed(
        "status", "swamp"
    )
    idx = Index(index_type=IndexType.VALUE, value_column="totalprice", order=IndexOrder.DESC)
    out = R.get_by_index_stream_from_many_single_scan(
        swamp, ["O", "F"], idx, filt=Cmp("totalprice", Op.GT, 100000.0), max_results=40
    )
    return out.select("key", "totalprice", "source_swamp")
