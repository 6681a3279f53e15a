"""Pins the cross-engine exactness foundations of the engine-stable
ANN goldens (golden/vectors_stable.py): DuckDB's list_sum fold order
and double-literal parsing. If either assumption breaks in a future
DuckDB, these fail before the oracle gate does — with a message that
says why."""

from __future__ import annotations

import random
import struct

import duckdb
import pytest

from hydraide_spark import golden

SF_SMOKE = "/root/testdata/sf0.001"


def _bits(x: float) -> bytes:
    return struct.pack("d", x)


def test_duckdb_list_sum_is_left_fold():
    """The stable ANN oracles compare UNROUNDED dot products and
    squared distances; that is only sound because DuckDB's list_sum is
    the same left fold as Spark's F.aggregate(xs, 0.0, acc + x)."""
    con = duckdb.connect()
    rng = random.Random(7)
    for n in (8, 64):
        for _ in range(50):
            xs = [rng.uniform(-1, 1) for _ in range(n)]
            lit = "[" + ",".join(f"'{x!r}'::DOUBLE" for x in xs) + "]"
            got = con.execute(f"SELECT list_sum({lit})").fetchone()[0]
            acc = 0.0
            for x in xs:
                acc += x
            assert _bits(got) == _bits(acc), (n, xs)


def test_duckdb_string_cast_literal_roundtrips_exactly():
    """Bare decimal literals parse as DECIMAL in DuckDB and lose bits
    on the cast to DOUBLE; _dlist embeds the LSH hyperplanes as
    string-cast literals because those strtod exactly."""
    con = duckdb.connect()
    rng = random.Random(11)
    for _ in range(100):
        v = rng.uniform(-3, 3)
        got = con.execute(f"SELECT '{v!r}'::DOUBLE").fetchone()[0]
        assert _bits(got) == _bits(v)
    # and document the trap this guards against: at least one bare
    # literal in 100 drops bits through the DECIMAL parse
    lossy = 0
    for _ in range(100):
        v = rng.uniform(-1, 1)
        got = con.execute(f"SELECT {v!r}::DOUBLE").fetchone()[0]
        lossy += _bits(got) != _bits(v)
    assert lossy > 0


def test_stable_ann_family_is_oracle_gated():
    """The round-3 gap: LSH/IVF/PQ-ADC/IVFADC had no oracle-gated
    variant. Each now registers a golden WITH an oracle."""
    oracles = golden.oracle_sql()
    for name in (
        "ann_topk_lsh_stable",
        "ann_topk_ivf_stable",
        "pq_ann_topk_stable",
        "ivfadc_topk_stable",
    ):
        assert name in oracles and "ROW_NUMBER" in oracles[name]


def test_label_centroids_are_contiguous():
    """ivf_topk indexes centroids by position; the stable goldens rely
    on embeddings labels being contiguous from 0 so position == label
    == PQ code id (asserted again at run time in _label_centroid_list)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    labs = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT label FROM '{sf_dir}/embeddings.parquet' ORDER BY label"
        ).fetchall()
    ]
    assert labs == list(range(len(labs)))


def test_multiprobe_lifts_recall_over_single_probe():
    """Multi-probe LSH must dominate single-probe recall at the same
    bit count (the flipped least-confident buckets only ADD candidates)
    while probing n_probes buckets instead of building n_probes
    tables."""
    from pyspark.sql import functions as F

    from hydraide_spark.functions.vector import (
        cosine_topk,
        lsh_multiprobe_topk,
    )
    from hydraide_spark.session import get_spark
    from hydraide_spark.sources.tables import load_table

    spark = get_spark("t")
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=10).collect()}

    def recall(n_probes):
        got = {
            (r["query_id"], r["vec_id"])
            for r in lsh_multiprobe_topk(
                emb, queries, k=10, dim=64, n_bits=4, n_probes=n_probes
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r5 = recall(1), recall(5)
    assert r5 > r1, (r1, r5)
    assert r5 >= 0.4  # measured 0.485 on this corpus; floor with margin


def test_auto_lsh_bits_pins_bucket_occupancy(spark):
    """Fixed n_bits makes the kNN self-join quadratic (10x scale
    stress: growth exponent 1.59) — auto-sizing must scale bucket
    count with the corpus so expected occupancy stays ~target."""
    from hydraide_spark.functions.vector import auto_lsh_bits, lsh_knn_self_join

    assert auto_lsh_bits(10) == 4
    assert auto_lsh_bits(1_000, target_bucket=32) == 5
    assert auto_lsh_bits(10_000, target_bucket=32) == 9
    assert auto_lsh_bits(100_000, target_bucket=32) == 12
    assert auto_lsh_bits(10**12) == 24  # clamp: multi-probe past here
    # occupancy n/2^bits stays within [target/2, 2*target] off clamps
    for n in (10**3, 10**5, 10**7, 10**9):
        occ = n / (1 << auto_lsh_bits(n, 32))
        assert 16 <= occ <= 64, (n, occ)

    # the auto-sized join still runs end-to-end and respects k
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_knn_self_join(df, k=3, dim=8).collect()
    assert out and max(r["rank"] for r in out) <= 3
    per_a = {}
    for r in out:
        per_a.setdefault(r["id_a"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_a.values())


def test_make_planes_prefix_property():
    """The auto-stable oracle inlines 12 planes and uses the first
    `bits` of them; the engine generates exactly `bits` planes. Both
    must be the same planes: make_planes draws row-major from one
    seeded stream, so shorter calls are prefixes of longer ones."""
    from hydraide_spark.functions.vector import make_planes

    full = make_planes(dim=64, n_bits=12, seed=42)
    for k in (4, 5, 6, 8):
        assert make_planes(dim=64, n_bits=k, seed=42) == full[:k]


def test_embedding_neardup_auto_stable_pair_density(spark):
    """The auto-stable golden must gate a DENSE pair set (every
    jittered twin is a near-dup; single-probe loses only the rare
    flipped-bit twin), not a vacuous empty result."""
    from hydraide_spark.golden.vectors_stable import embedding_neardup_auto_stable

    n = len(embedding_neardup_auto_stable(spark, SF_SMOKE).collect())
    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert n >= int(base * 0.9)  # >= 90% of twins survive blocking
