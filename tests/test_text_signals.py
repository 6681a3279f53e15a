"""Repetition-signal semantics: hand-computed counts on crafted docs,
edge cases (single token, all-identical), and the zero-shuffle plan
invariant (the operator must ride the scan stage — no Exchange)."""

from __future__ import annotations

from pyspark.sql import Row

from hydraide_spark.functions.text import repetition_signals
from hydraide_spark.plans import count_exchanges


def _signals(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = repetition_signals(df, "doc_id", "text").collect()
    return {r["doc_id"]: r.asDict() for r in rows}

def test_hand_computed_counts(spark):
    out = _signals(
        spark,
        [
            # tokens: a a b a c  -> n=5, top uni 'a'=3, dup=3
            # bigrams: 'a a','a b','b a','a c' -> all unique: top 1, dup 0
            "a a b a c",
            # 'x y x y x y' -> n=6, top uni=3, dup=6 (x:3 + y:3)
            # bigrams: 'x y' x3, 'y x' x2 -> top 3, dup 5
            "x y x y x y",
        ],
    )
    assert out[0] == {
        "doc_id": 0, "n_tokens": 5, "top_unigram_n": 3, "dup_unigram_n": 3,
        "top_bigram_n": 1, "dup_bigram_n": 0,
        # dup frac 3/5 = 0.6 <= 0.8; no bigram repeats (top=1) -> False
        "repetitive": False,
    }
    assert out[1] == {
        "doc_id": 1, "n_tokens": 6, "top_unigram_n": 3, "dup_unigram_n": 6,
        "top_bigram_n": 3, "dup_bigram_n": 5, "repetitive": True,
    }


def test_edge_cases(spark):
    out = _signals(spark, ["solo", "same same same same same", "u v w x y z"])
    # single token: no bigrams, nothing duplicated
    assert out[0] == {
        "doc_id": 0, "n_tokens": 1, "top_unigram_n": 1, "dup_unigram_n": 0,
        "top_bigram_n": 0, "dup_bigram_n": 0, "repetitive": False,
    }
    # fully repeated: everything duplicated, flag on
    assert out[1] == {
        "doc_id": 1, "n_tokens": 5, "top_unigram_n": 5, "dup_unigram_n": 5,
        "top_bigram_n": 4, "dup_bigram_n": 4, "repetitive": True,
    }
    # all distinct: no duplication anywhere, flag off
    assert out[2] == {
        "doc_id": 2, "n_tokens": 6, "top_unigram_n": 1, "dup_unigram_n": 0,
        "top_bigram_n": 1, "dup_bigram_n": 0, "repetitive": False,
    }


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b a")])
    out = repetition_signals(df, "doc_id", "text")
    assert count_exchanges(out) == 0
