"""Declarative data-quality validation (functions/quality_checks.py):
rule semantics (NULL handling per kind), violation counting, and the
one-scan plan contract for row-local rule sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.quality_checks import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
    validate,
)


def _df(spark):
    rows = [
        (1, 10.0, "A", "a-1"),
        (2, None, "N", "b-2"),
        (2, 99.0, "X", "bad"),
        (4, -5.0, None, "c-3"),
    ]
    return spark.createDataFrame(rows, "k long, v double, flag string, code string")


def test_row_local_rule_semantics(spark):
    df = _df(spark)
    rep = {
        r["rule"]: (r["violations"], r["total"], r["passed"])
        for r in validate(
            df,
            [
                not_null("v_not_null", "v"),
                in_range("v_band", "v", 0.0, 50.0),  # NULL and out-of-range fail
                in_set("flag_domain", "flag", ["A", "N"]),  # NULL not in set
                matches("code_shape", "code", r"^[a-z]-\d$"),
            ],
        ).collect()
    }
    assert rep["v_not_null"] == (1, 4, False)
    assert rep["v_band"] == (3, 4, False)  # None, 99.0, -5.0
    assert rep["flag_domain"] == (2, 4, False)  # 'X' and NULL
    assert rep["code_shape"] == (1, 4, False)  # 'bad'


def test_unique_and_foreign_key_counting(spark):
    df = _df(spark)
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    rep = {
        r["rule"]: (r["violations"], r["total"], r["passed"])
        for r in validate(
            df,
            [unique("k_unique", "k"), foreign_key("k_fk", "k", ref, "rk")],
        ).collect()
    }
    # k=2 appears twice: one surplus row beyond the first
    assert rep["k_unique"] == (1, 4, False)
    # k=4 has no referenced row
    assert rep["k_fk"] == (1, 4, False)
    # all-green path
    ok = validate(df, [not_null("k_nn", "k")]).collect()[0]
    assert ok["passed"] is True and ok["violations"] == 0


def test_row_local_rules_share_one_scan(spark, tmp_path):
    """N row-local rules must not become N scans: the report plan reads
    the input exactly once (conditional-count aggregate + explode)."""
    p = str(tmp_path / "t.parquet")
    _df(spark).write.parquet(p)
    df = spark.read.parquet(p)
    rep = validate(
        df,
        [
            not_null("a", "v"),
            in_range("b", "v", 0.0, 50.0),
            in_set("c", "flag", ["A", "N"]),
            matches("d", "code", r"^[a-z]-\d$"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_profile_table_single_scan_and_values(spark, tmp_path):
    from hydraide_spark.functions.profiling import profile_table

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "k long, s string"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    rep = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert rep["k"]["n"] == 3 and rep["k"]["n_null"] == 0
    assert rep["k"]["n_distinct"] == 2
    assert (rep["k"]["min_str"], rep["k"]["max_str"]) == ("1", "2")
    assert rep["s"]["n_null"] == 1 and rep["s"]["n_distinct"] == 2
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # approx mode keeps the same single-pass shape
    plan2 = profile_table(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") == 1


def test_validate_rejects_unknown_kind_and_empty_rules(spark):
    """A typo'd rule kind must fail loudly, not silently vanish from
    the report (the false-green a validation suite exists to prevent);
    an empty rule set is a caller bug."""
    import pytest as _pytest

    from hydraide_spark.functions.quality_checks import Rule, validate

    df = _df(spark)
    with _pytest.raises(ValueError, match="unknown rule kind"):
        validate(df, [Rule("typo", "not_nul", "v")])
    with _pytest.raises(ValueError, match="at least one"):
        validate(df, [])


def test_validate_on_empty_input_reports_zero_violations_and_passes(spark):
    """SUM over zero rows is NULL: without the coalesce an empty
    promotion candidate reported NULL violations and a NULL (neither
    pass nor fail) verdict (ADVICE r4)."""
    from hydraide_spark.functions.quality_checks import (
        in_range,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame([], "k long, v double")
    rep = {
        r["rule"]: r.asDict()
        for r in validate(
            df, [not_null("k_nn", "k"), in_range("v_rng", "v", 0, 1), unique("k_uq", "k")]
        ).collect()
    }
    for name in ("k_nn", "v_rng", "k_uq"):
        assert rep[name]["violations"] == 0, name
        assert rep[name]["total"] == 0, name
        assert rep[name]["passed"] is True, name
