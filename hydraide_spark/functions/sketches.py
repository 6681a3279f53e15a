"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark SQL as `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`).

Reference parity note: the reference's only distinct-ish surface is the
set-valued `Uint32Slice` cell (proto/hydraide.proto:960-964 — exact,
bounded) and per-swamp `Count` (gateway.go:1396-1480). At 100 TB an
exact global distinct is a full shuffle of every key; the mergeable
sketch replaces it with byte-sized per-partition state:

- build once per fine-grained group (map-side partial aggregation — the
  shuffle carries one ~2^lg_k-byte sketch per group, not the keys);
- re-aggregate to ANY coarser grouping later by unioning the stored
  sketches (`hll_union_agg`) — no second pass over raw data. This is
  the pre-aggregated-cube pattern: daily sketches roll up to monthly
  without rescanning the corpus.

Determinism: HLL register updates are order- and partition-independent
(register max), so estimates are stable across shuffles and retries —
safe for the rows-only correctness gate. DataSketches HLL is EXACT
below its sparse-mode threshold (couponed list), which the tests pin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def hll_group_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` + its estimate.

    Output: group_cols + ``sketch`` (binary, mergeable) + ``distinct_est``
    (bigint). Store the sketch column; re-aggregate with
    :func:`hll_rollup` instead of rescanning raw data.
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    out = df.groupBy(*group_cols).agg(sk)
    return out.withColumn("distinct_est", F.hll_sketch_estimate("sketch"))


def hll_rollup(df_sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Union-merge stored sketches to a coarser grouping (no raw-data
    pass). Empty ``rollup_cols`` merges to a single global row."""
    merged = F.hll_union_agg("sketch").alias("sketch")
    if rollup_cols:
        out = df_sketches.groupBy(*rollup_cols).agg(merged)
    else:
        out = df_sketches.agg(merged)
    return out.withColumn("distinct_est", F.hll_sketch_estimate("sketch"))


def exact_distinct(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Exact comparison baseline: countDistinct per group (full shuffle
    of the distinct keys — the cost the sketch path avoids)."""
    agg = F.countDistinct(value_col).alias("distinct_exact")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan '05): mergeable frequency
# estimates with bounded over-count, the companion to HLL for "how
# often" instead of "how many distinct".


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4
) -> DataFrame:
    """Sparse Count-Min sketch of ``value_col`` as a (d, bucket, cnt)
    cell frame — width fixed at 256 per row by construction (the bucket
    key is the first TWO HEX CHARS of ``md5(d ':' value)``, so both the
    hashing and the bucket id are bit-identical in any engine: no
    seeded-native-hash divergence, no hex→int conversion).

    100 TB shape: one explode to depth cells + one partial-agg groupBy;
    the shuffle carries at most depth×256 cells PER PARTITION no matter
    the keyspace — frequency estimation without ever shuffling the keys
    (the exact-count alternative shuffles every distinct key). Sketches
    are mergeable: union cell frames and re-sum (:func:`cms_merge`) —
    the same pre-aggregated-cube pattern as the HLL rollup.

    Estimates over-count only (min over depth rows of a sum that
    includes every true occurrence); error ≤ 2e/width × total with
    probability 1−(1/2)^depth."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{d}:"),
                                    F.col(value_col).cast("string"),
                                )
                            ),
                            1,
                            2,
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*cms_frames: DataFrame) -> DataFrame:
    """Merge sketches built with the same depth: union + re-sum."""
    out = cms_frames[0]
    for f in cms_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame, probes: DataFrame, value_col: str, depth: int = 4
) -> DataFrame:
    """Point-frequency estimates for each probe value: min over the
    depth cells the value hashes to (missing cell ⇒ the value never
    occurred ⇒ 0). Returns (value_col, est). The cell frame is
    depth×256 rows — always broadcastable, so probing is map-side."""
    pb = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{d}:"),
                                    F.col(value_col).cast("string"),
                                )
                            ),
                            1,
                            2,
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(value_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    joined = pb.join(F.broadcast(cms), ["d", "bucket"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantiles: the mergeable quantile summary whose
# error bound is explicit ((max-min)/bins) and whose arithmetic is
# deterministic enough to replay bit-for-bit in another engine —
# unlike t-digest/KLL whose internals are engine-specific.


def histogram_bins(df: DataFrame, value_col: str, bins: int = 128) -> DataFrame:
    """Equi-width histogram of ``value_col``: (bin, cnt) with
    ``bins`` rows at most. One tiny min/max aggregate broadcast into
    the binning expression (no driver collect), then one groupBy whose
    shuffle carries ≤ ``bins`` cells per partition — corpus-size-
    independent state, mergeable by summing counts (same domain).
    The top edge folds into the last bin (least()). NULL values are
    excluded up front — min/max already ignore them, and a NULL bin
    row would poison the driver-side sort in
    :func:`histogram_quantiles` (None is not orderable against int)."""
    df = df.filter(F.col(value_col).isNotNull())
    mm = df.agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
    )
    binned = df.crossJoin(F.broadcast(mm)).select(
        # constant column: zero width would divide by zero (an ERROR
        # under ANSI) — every value lands in bin 0 and the quantile
        # extractor short-circuits to mn
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col(value_col).cast("double") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / F.lit(float(bins)))
                ).cast("long"),
                F.lit(bins - 1),
            )
        )
        .alias("bin"),
        "mn",
        "mx",
    )
    return binned.groupBy("bin", "mn", "mx").agg(F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(
    df: DataFrame, value_col: str, qs: Sequence[float], bins: int = 128
) -> "list[tuple[float, float]]":
    """Quantile estimates [(q, est), ...] from the equi-width
    histogram: walk the ≤``bins`` collected cells (bounded driver
    work), linear-interpolate inside the bin where the cumulative
    count crosses q·N. Error ≤ one bin width. The arithmetic is a
    fixed operand order over IEEE doubles (+, *, / are correctly
    rounded), so an oracle replaying the same order matches
    bit-for-bit — no rounding needed in comparisons."""
    rows = sorted(
        histogram_bins(df, value_col, bins).collect(), key=lambda r: r["bin"]
    )
    if not rows:
        return [(q, float("nan")) for q in qs]
    mn, mx = rows[0]["mn"], rows[0]["mx"]
    if mn == mx:
        # constant column: zero bin width would divide by zero upstream
        # (the bin expression yields NULL bins); every quantile IS mn
        return [(q, mn) for q in qs]
    width = (mx - mn) / float(bins)
    n = sum(r["cnt"] for r in rows)
    out = []
    for q in qs:
        t = q * n
        cum = 0.0
        est = mx
        for r in rows:
            if cum + r["cnt"] >= t:
                frac = (t - cum) / r["cnt"]
                est = mn + (r["bin"] + frac) * width
                break
            cum += r["cnt"]
        out.append((q, est))
    return out


def histogram_bins_fixed(
    df: DataFrame, value_col: str, lo: float, hi: float, bins: int = 128
) -> DataFrame:
    """Equi-width histogram over a DECLARED domain [lo, hi): the
    mergeable/streaming form — :func:`histogram_bins` derives min/max
    from the data, so two sketches built on different batches bin on
    different domains and their cells cannot be summed; fixing the
    domain up front makes cells associative counters exactly like CMS
    cells. Out-of-domain values clamp into the edge bins (count never
    silently drops); NULLs are excluded like in :func:`histogram_bins`
    (a NULL would otherwise survive the clamp as a NULL bin).
    Returns (bin, cnt)."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    df = df.filter(F.col(value_col).isNotNull())
    width = (hi - lo) / float(bins)
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)).cast(
                "long"
            ),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    return df.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# --- Bloom filter (r13) -------------------------------------------------------


def bloom_bits_for(n_values: int, target_fpr: float = 0.01) -> int:
    """Bit-array size for an expected ``n_values`` at ``target_fpr``
    (the standard m = -n ln p / ln^2 2), rounded up to a power of two
    (the modulo stays cheap and the word math exact). The auto-sizing
    rule that keeps the sketch's false-positive rate constant as the
    corpus grows — fixed bits on growing data is the same trap as
    fixed-cardinality blocking keys."""
    import math

    if n_values <= 0:
        return 1 << 10
    m = -float(n_values) * math.log(float(target_fpr)) / (math.log(2.0) ** 2)
    return 1 << max(10, int(math.ceil(m)).bit_length())


def _bloom_positions(value, n_bits: int, k: int):
    """k bit positions of a value: decimal value of the first 15 hex
    chars (60 bits) of md5('<i>:' value) mod n_bits — the cms_build
    hashing convention, bit-identical in any engine (no seeded native
    hash, no hex->int divergence)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), value.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % F.lit(int(n_bits))
        ).alias(f"pos{i}")
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, value_col: str, n_bits: int = 1 << 15, k: int = 4
) -> DataFrame:
    """Bloom filter of ``value_col`` as a sparse (word, bits) frame —
    32-bit words (max shift 31, so the packed value is positive in any
    engine's signed 64-bit int), at most ``n_bits/32`` rows however
    large the input. One explode to k positions + one bit_or groupBy
    (map-side combined): membership summaries without ever shuffling
    the keys. NO false negatives ever (every inserted value's bits are
    set); false positives at the standard (1 - e^{-kn/m})^k rate —
    size with :func:`bloom_bits_for`. Mergeable: :func:`bloom_merge`
    (bit_or is associative/idempotent — the HLL/CMS rollup pattern,
    and idempotence makes re-inserts free)."""
    cells = df.select(
        F.explode(
            F.array(*_bloom_positions(F.col(value_col), n_bits, k))
        ).alias("pos")
    )
    return (
        cells.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("bitval"),
        )
        .groupBy("word")
        .agg(F.bit_or("bitval").alias("bits"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge filters built with the same (n_bits, k): union + bit_or.
    bloom(A ∪ B) == merge(bloom(A), bloom(B)) exactly."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_bits: int = 1 << 15,
    k: int = 4,
) -> DataFrame:
    """Membership probe: (value, might_contain) — 1 iff ALL k of the
    value's bits are set (min over the k position rows = AND). The
    bloom side is ≤ n_bits/32 rows (broadcastable at any corpus size —
    AQE decides); a missing word reads as 0 (left join + coalesce).
    might_contain=0 is DEFINITIVE absence; 1 means "probably seen"."""
    p = probes.select(
        F.col(value_col),
        F.explode(
            F.array(*_bloom_positions(F.col(value_col), n_bits, k))
        ).alias("pos"),
    ).select(
        F.col(value_col),
        F.shiftright(F.col("pos"), 5).alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("bitval"),
    )
    j = p.join(bloom, "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bitval"))
        == F.col("bitval")
    )
    return j.groupBy(value_col).agg(
        F.min(hit.cast("int")).alias("might_contain")
    )
