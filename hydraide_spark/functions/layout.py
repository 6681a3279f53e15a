"""Data-layout operators: Z-order (Morton) clustering keys for
multi-dimensional locality.

A single-column sort gives perfect pruning on one predicate column and
none on the others; interleaving the bits of several columns gives
every interleaved column partial locality, so min/max zone maps (parquet
row-group stats, file-level stats at 100 TB) prune on ANY of them. This
is the layout trick behind Delta/Iceberg Z-ORDER — here as a pure
integer column expression usable in ``repartitionByRange(zkey) +
sortWithinPartitions(zkey)`` before a write.

Everything is deterministic integer bit math (shiftleft/shiftright/
bitwise AND/OR over longs), so the key is exactly reproducible in any
engine — the golden query value-checks it bit-for-bit against SQL.

Reference anchor: the reference stores one beacon sort order per swamp
(app/core/beacon — single-dimension ordering); Z-order is the
multi-dimension generalization its users ask for when filtering on
(user, time) at once.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def rank_normalize(df: DataFrame, col: str, bits: int) -> DataFrame:
    """Map an arbitrary numeric/orderable column onto [0, 2^bits) by
    PERCENT rank — the standard Z-order pre-step when value domains are
    skewed or unbounded (raw values waste interleave bits on empty
    range). One window over the column; at scale this is done on a
    sample to derive range boundaries instead (repartitionByRange does
    exactly that internally), so the exact-window form here is the
    small-dim/oracle-checkable variant."""
    from pyspark.sql import Window as W

    pr = F.percent_rank().over(W.orderBy(F.col(col)))
    scaled = F.least(
        (pr * F.lit(float(1 << bits))).cast("long"), F.lit((1 << bits) - 1)
    )
    return df.withColumn(f"{col}_zbin", scaled)


def minmax_normalize(df: DataFrame, col: str, bits: int) -> DataFrame:
    """Map an integer column onto [0, 2^bits) by linear min-max
    binning: ``(v - min) * 2^bits div (max - min + 1)`` — the layout
    pre-step for DENSE/UNIFORM domains (surrogate keys). One tiny
    min/max aggregate, then a pure integer expression: no window, no
    shuffle, bit-exact in any engine. The result is always inside the
    bin range by construction. Use :func:`rank_normalize` instead when
    the domain is skewed (equi-POPULATED bins need ranks)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    if row["mn"] is None:
        # min/max over zero (non-NULL) rows is NULL — fail with the real
        # cause instead of an opaque int(None) TypeError (ADVICE r4)
        raise ValueError(
            f"minmax_normalize({col!r}): input is empty or all-NULL; "
            "nothing to bin"
        )
    mn, mx = int(row["mn"]), int(row["mx"])
    span = mx - mn + 1
    return df.withColumn(
        f"{col}_zbin",
        F.expr(f"((CAST({col} AS BIGINT) - {mn}) * {1 << bits}) div {span}"),
    )


def assert_zorder_domain(df: DataFrame, cols: Sequence[str], bits: int) -> None:
    """Enforce zorder_key's precondition (values in [0, 2^bits)) with
    one tiny min/max aggregate — RAISES instead of letting out-of-range
    values silently alias distant keys and degrade zone-map pruning
    (ADVICE r3). Call once before a layout write; the key itself stays
    a pure expression so the check cannot live inside it."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    hi = 1 << bits
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        if mn is not None and (int(mn) < 0 or int(mx) >= hi):
            raise ValueError(
                f"zorder column {c!r} spans [{mn}, {mx}], outside [0, {hi}) "
                f"for bits={bits}; rank_normalize it (or raise bits)"
            )


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    column round-robin (column 0 gets the least-significant position of
    each group). Inputs must already be non-negative ints < 2^bits —
    use :func:`rank_normalize` for arbitrary domains and
    :func:`assert_zorder_domain` to enforce the precondition before a
    layout write (values past 2^bits would silently alias distant keys
    and defeat the zone-map pruning this layout exists for). Pure
    shiftleft/and/or expression — map-only, engine-exact.

    n columns x ``bits`` bits must fit a signed long: n*bits <= 62.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: Optional[int] = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    min-max-normalize each dimension, interleave, range-partition on
    the key (one output file per range) and sort within partitions —
    after which EVERY interleaved column's per-file min/max footprint
    is narrow, so row-group/file zone maps prune reads filtered on ANY
    of them (a single-column sort gives this for one column and
    nothing for the rest; proven empirically from the parquet footers
    in tests/test_plans.py). The key columns are written as-is; the
    key itself is dropped (it is derivable and would bloat the
    schema)."""
    out = df
    for c in cols:
        out = minmax_normalize(out, c, bits)
    zbins = [f"{c}_zbin" for c in cols]
    assert_zorder_domain(out, zbins, bits)
    out = out.withColumn("_zkey", zorder_key(zbins, bits))
    n = num_files or out.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *zbins)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Z-order key as ANSI SQL text (for oracles and for
    engines without the column API): the same shift/and/or tree in the
    same order."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)
