"""DSIR model-math edge cases (pure Python — no Spark)."""

from __future__ import annotations

from decimal import Decimal

from hydraide_spark.functions.sampling import dsir_logratios_from_counts


def test_empty_target_counts_stay_finite():
    # no target grams at all: every bucket carries the pure smoothing
    # ratio ln(1/B / q_b) — finite, no crash
    out = dsir_logratios_from_counts({}, {0: 10, 1: 5}, n_buckets=4)
    assert len(out) == 4 and all(isinstance(v, Decimal) for v in out)


def test_both_empty_is_zero_model():
    # identical (empty) corpora: target and raw smoothed ratios are
    # equal bucket-by-bucket, so every log-ratio is exactly 0
    out = dsir_logratios_from_counts({}, {}, n_buckets=8)
    assert out == [Decimal("0.000000000000")] * 8


def test_identical_counts_zero_everywhere():
    c = {0: 7, 3: 2}
    out = dsir_logratios_from_counts(c, c, n_buckets=4)
    assert out == [Decimal("0.000000000000")] * 4


def test_target_heavy_bucket_positive():
    out = dsir_logratios_from_counts({0: 100}, {0: 100, 1: 100}, n_buckets=2)
    assert out[0] > 0 > out[1]
