"""Passage-level near-dup (functions/dedup.py::chunk_neardup_pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hydraide_spark.functions.dedup import chunk_neardup_pairs


def test_chunk_neardup_finds_shared_passage_not_whole_docs(spark):
    """Two long documents that differ entirely EXCEPT for one shared
    16-token paragraph: doc-level Jaccard sits far below any sane tau,
    but the chunk-level pipeline pairs exactly the aligned passage."""
    para = " ".join(f"shared{i}" for i in range(16))
    a = para + " " + " ".join(f"aword{i}" for i in range(48))
    b = para + " " + " ".join(f"bword{i}" for i in range(48))
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    pairs = chunk_neardup_pairs(
        docs, tau=0.6, chunk_size=16, engine_stable=True
    ).collect()
    got = {(r.doc_a, r.chunk_a, r.doc_b, r.chunk_b) for r in pairs}
    assert got == {(1, 0, 2, 0)}, got
    (only,) = pairs
    assert only.inter == only.union  # identical chunks: Jaccard 1

    # whole-doc near-dup at the same tau finds nothing (the dilution)
    from hydraide_spark.functions.dedup import minhash_neardup_pairs

    assert (
        minhash_neardup_pairs(docs, tau=0.6, engine_stable=True).count() == 0
    )


def test_chunk_neardup_within_doc_pairs_optional(spark):
    """A doc repeating its own paragraph pairs with itself only when
    cross_doc_only=False (self-repetition is repetition_signals' job
    by default)."""
    para = " ".join(f"rep{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(7, para + " " + para)], "doc_id long, text string"
    )
    assert (
        chunk_neardup_pairs(docs, tau=0.6, chunk_size=16, engine_stable=True).count()
        == 0
    )
    within = chunk_neardup_pairs(
        docs, tau=0.6, chunk_size=16, engine_stable=True, cross_doc_only=False
    ).collect()
    assert {(r.doc_a, r.chunk_a, r.doc_b, r.chunk_b) for r in within} == {(7, 0, 7, 1)}


def test_chunk_neardup_packing_guard(spark):
    docs = spark.createDataFrame(
        [(-1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packing range"):
        chunk_neardup_pairs(docs, tau=0.6, chunk_size=4, engine_stable=True).count()


def test_chunk_neardup_collapse_star_edges(spark):
    """Three docs sharing one byte-identical paragraph: collapsed mode
    emits the 2 star edges (min-key representative) instead of the 3
    full pairs, and the connectivity (who near-dups whom, transitively)
    is unchanged."""
    para = " ".join(f"bp{i}" for i in range(16))
    rows = [
        (i, para + " " + " ".join(f"w{i}_{j}" for j in range(48)))
        for i in (1, 2, 3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = chunk_neardup_pairs(docs, tau=0.6, chunk_size=16, engine_stable=True)
    coll = chunk_neardup_pairs(
        docs, tau=0.6, chunk_size=16, engine_stable=True, collapse_exact=True
    )
    fp = {(r.doc_a, r.doc_b) for r in full.collect()}
    cp = {(r.doc_a, r.doc_b) for r in coll.collect()}
    assert fp == {(1, 2), (1, 3), (2, 3)}
    assert cp == {(1, 2), (1, 3)}  # star around the min-key rep
