"""Filter-semantics unit tables, mirroring the reference's
filter_test.go / filter_nested_slice_test.go case style (SURVEY.md §5):
every predicate's edge cases — nulls, missing paths, empty slices,
case-sensitivity, quantifier boundaries — against a small in-memory
fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from hydraide_spark.query import (
    And,
    Cmp,
    GeoDistance,
    Labeled,
    NestedWhere,
    Not,
    Op,
    Or,
    Phrase,
    Quant,
    VectorSim,
    translate,
    with_search_meta,
)


@pytest.fixture(scope="module")
def fixture_df(spark):
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("name", T.StringType(), True),
            T.StructField("price", T.LongType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField(
                "attrs", T.MapType(T.StringType(), T.LongType()), True
            ),
            T.StructField(
                "body",
                T.StructType(
                    [
                        T.StructField("category", T.StringType(), True),
                        T.StructField(
                            "address",
                            T.StructType([T.StructField("city", T.StringType(), True)]),
                            True,
                        ),
                    ]
                ),
                True,
            ),
            T.StructField(
                "entries",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("name", T.StringType(), True),
                            T.StructField("active", T.BooleanType(), True),
                            T.StructField("budget", T.LongType(), True),
                        ]
                    )
                ),
                True,
            ),
            T.StructField(
                "word_index", T.MapType(T.StringType(), T.ArrayType(T.IntegerType())), True
            ),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("lat", T.DoubleType(), True),
            T.StructField("lng", T.DoubleType(), True),
        ]
    )
    rows = [
        # k1: the "books" row — rich nested content
        (
            "k1",
            "Clean Code",
            2500,
            ["tech", "Programming"],
            {"views": 100, "stars": 5},
            ("books", ("Budapest",)),
            [("c1", True, 100), ("c2", True, 50), ("c3", False, 10)],
            {"general": [1, 9], "terms": [2, 14], "conditions": [3]},
            [1.0, 0.0, 0.0, 0.0],
            47.4979,
            19.0402,
        ),
        # k2: empty-ish row — nulls and empty containers
        ("k2", "", None, [], {}, (None, None), [], {}, None, 0.0, 0.0),
        # k3: all-null optionals (missing-path semantics)
        ("k3", None, 1500, None, None, None, None, None, None, None, None),
        # k4: music row; phrase words present but NOT consecutive
        (
            "k4",
            "Jazz Standards",
            900,
            ["music"],
            {"views": 7},
            ("music", ("Wien",)),
            [("c4", False, 0)],
            {"general": [1], "terms": [5], "conditions": [6]},
            [0.6, 0.8, 0.0, 0.0],
            48.2082,
            16.3738,
        ),
    ]
    return spark.createDataFrame([Row(*r) for r in rows], schema)


def keys(df, pred):
    return sorted(r["key"] for r in df.filter(translate(pred, df)).select("key").collect())


# --- scalar ops & null handling -------------------------------------------


def test_eq_and_range(fixture_df):
    assert keys(fixture_df, Cmp("price", Op.GT, 1000)) == ["k1", "k3"]
    assert keys(fixture_df, Cmp("price", Op.LE, 900)) == ["k4"]
    # NULL price never matches, in either polarity (missing => no-match)
    assert keys(fixture_df, Cmp("price", Op.NE, 2500)) == ["k3", "k4"]


def test_string_ops_case_sensitive(fixture_df):
    assert keys(fixture_df, Cmp("name", Op.CONTAINS, "Code")) == ["k1"]
    assert keys(fixture_df, Cmp("name", Op.CONTAINS, "code")) == []
    assert keys(fixture_df, Cmp("name", Op.STARTS_WITH, "Jazz")) == ["k4"]
    assert keys(fixture_df, Cmp("name", Op.ENDS_WITH, "Code")) == ["k1"]
    # NOT_CONTAINS: null name (k3) does not match
    assert keys(fixture_df, Cmp("name", Op.NOT_CONTAINS, "Code")) == ["k2", "k4"]


def test_empty_group_passes_all(fixture_df):
    assert keys(fixture_df, And([])) == ["k1", "k2", "k3", "k4"]
    assert keys(fixture_df, Or([])) == ["k1", "k2", "k3", "k4"]


def test_is_empty_string_vs_null(fixture_df):
    # IS_EMPTY on string: '' and NULL both empty (filter_native.go:236-278)
    assert keys(fixture_df, Cmp("name", Op.IS_EMPTY)) == ["k2", "k3"]
    assert keys(fixture_df, Cmp("name", Op.IS_NOT_EMPTY)) == ["k1", "k4"]


def test_is_empty_containers(fixture_df):
    assert keys(fixture_df, Cmp("tags", Op.IS_EMPTY)) == ["k2", "k3"]
    assert keys(fixture_df, Cmp("attrs", Op.IS_EMPTY)) == ["k2", "k3"]


def test_in_ops(fixture_df):
    assert keys(fixture_df, Cmp("price", Op.IN, [900, 1500])) == ["k3", "k4"]
    # NOT_IN: null price doesn't match
    assert keys(fixture_df, Cmp("price", Op.NOT_IN, [900])) == ["k1", "k3"]


# --- map / slice ops -------------------------------------------------------


def test_has_key(fixture_df):
    assert keys(fixture_df, Cmp("attrs", Op.HAS_KEY, "stars")) == ["k1"]
    # HAS_NOT_KEY: requires the map to exist (nil body => no match,
    # filter_test.go:220-350)
    assert keys(fixture_df, Cmp("attrs", Op.HAS_NOT_KEY, "stars")) == ["k2", "k4"]


def test_slice_contains(fixture_df):
    assert keys(fixture_df, Cmp("tags", Op.SLICE_CONTAINS, "music")) == ["k4"]
    assert keys(fixture_df, Cmp("tags", Op.SLICE_NOT_CONTAINS, "music")) == ["k1", "k2"]


def test_slice_contains_substring_case_insensitive(fixture_df):
    # 'PROG' matches 'Programming' (case-insensitive, filter.go:656-671)
    assert keys(fixture_df, Cmp("tags", Op.SLICE_CONTAINS_SUBSTRING, "PROG")) == ["k1"]
    assert keys(fixture_df, Cmp("tags", Op.SLICE_NOT_CONTAINS_SUBSTRING, "PROG")) == [
        "k2",
        "k4",
    ]


# --- nested paths, wildcard, #len -----------------------------------------


def test_nested_path_and_missing(fixture_df):
    assert keys(fixture_df, Cmp("body.category", Op.EQ, "books")) == ["k1"]
    assert keys(fixture_df, Cmp("body.address.city", Op.EQ, "Budapest")) == ["k1"]
    # missing path (k3 body null) never matches
    assert keys(fixture_df, Cmp("body.address.city", Op.NE, "Budapest")) == ["k4"]


def test_len_pseudo_path(fixture_df):
    assert keys(fixture_df, Cmp("tags.#len", Op.GT, 1)) == ["k1"]
    assert keys(fixture_df, Cmp("entries.#len", Op.EQ, 0)) == ["k2"]


def test_wildcard_any_element(fixture_df):
    assert keys(fixture_df, Cmp("entries[*].budget", Op.GE, 100)) == ["k1"]
    assert keys(fixture_df, Cmp("tags[*]", Op.STARTS_WITH, "mus")) == ["k4"]
    # empty slice => no match; null slice => no match
    assert keys(fixture_df, Cmp("entries[*].budget", Op.GE, 0)) == ["k1", "k4"]


# --- NestedSliceWhere quantifiers -----------------------------------------


def test_nested_where_any_all_none_count(fixture_df):
    active = Cmp("active", Op.EQ, True)
    # ANY: empty slice (k2) => false, missing (k3) => false
    assert keys(fixture_df, NestedWhere("entries", active, Quant.ANY)) == ["k1"]
    # ALL: empty slice => TRUE (vacuous), missing => no-match
    assert keys(fixture_df, NestedWhere("entries", active, Quant.ALL)) == ["k2"]
    # NONE: empty slice => TRUE, missing => no-match
    assert keys(fixture_df, NestedWhere("entries", active, Quant.NONE)) == ["k2", "k4"]
    # COUNT >= 2
    assert keys(
        fixture_df, NestedWhere("entries", active, Quant.COUNT, Op.GE, 2)
    ) == ["k1"]
    # COUNT == 0 includes the empty slice but not the missing one
    assert keys(
        fixture_df, NestedWhere("entries", active, Quant.COUNT, Op.EQ, 0)
    ) == ["k2", "k4"]


def test_nested_where_inner_group(fixture_df):
    inner = And([Cmp("active", Op.EQ, True), Cmp("budget", Op.GE, 100)])
    assert keys(fixture_df, NestedWhere("entries", inner, Quant.ANY)) == ["k1"]


# --- phrase ----------------------------------------------------------------


def test_phrase_consecutive(fixture_df):
    p = Phrase("word_index", ["general", "terms", "conditions"])
    assert keys(fixture_df, p) == ["k1"]  # k4 has the words, not consecutive
    assert keys(fixture_df, Phrase("word_index", ["general", "terms", "conditions"], negate=True)) == [
        "k2",
        "k3",
        "k4",
    ]


def test_phrase_missing_word_and_single(fixture_df):
    assert keys(fixture_df, Phrase("word_index", ["general", "nonexistent"])) == []
    assert keys(fixture_df, Phrase("word_index", ["terms"])) == ["k1", "k4"]


# --- vector ----------------------------------------------------------------


def test_vector_similarity_and_dim_mismatch(fixture_df):
    v = VectorSim("embedding", [1.0, 0.0, 0.0, 0.0], 0.9)
    assert keys(fixture_df, v) == ["k1"]
    v2 = VectorSim("embedding", [1.0, 0.0, 0.0, 0.0], 0.5)
    assert keys(fixture_df, v2) == ["k1", "k4"]
    # dimension mismatch => no match (filter.go:594-608)
    v3 = VectorSim("embedding", [1.0, 0.0], 0.0)
    assert keys(fixture_df, v3) == []


# --- geo -------------------------------------------------------------------


def test_geo_inside_outside_null_island(fixture_df):
    # Budapest within 50km of Budapest; Wien ~215km away
    g_in = GeoDistance("lat", "lng", 47.4979, 19.0402, 50.0, inside=True)
    assert keys(fixture_df, g_in) == ["k1"]
    # OUTSIDE: Wien matches; Null Island (k2) excluded despite being far;
    # null coords (k3) excluded
    g_out = GeoDistance("lat", "lng", 47.4979, 19.0402, 50.0, inside=False)
    assert keys(fixture_df, g_out) == ["k4"]
    # band: outside 100 inside 300 => Wien
    band = And(
        [
            GeoDistance("lat", "lng", 47.4979, 19.0402, 100.0, inside=False),
            GeoDistance("lat", "lng", 47.4979, 19.0402, 300.0, inside=True),
        ]
    )
    assert keys(fixture_df, band) == ["k4"]


# --- labels / search meta --------------------------------------------------


def test_labeled_filters_no_short_circuit(fixture_df):
    labeled = [
        Labeled("cheap", Cmp("price", Op.LE, 1000)),
        Labeled("books", Cmp("body.category", Op.EQ, "books")),
        Labeled("vec", VectorSim("embedding", [1.0, 0.0, 0.0, 0.0], 0.5)),
    ]
    out = with_search_meta(fixture_df, labeled).select("key", "matched_labels", "score_vec")
    rows = {r["key"]: r for r in out.collect()}
    assert set(rows) == {"k1", "k4"}
    assert rows["k1"]["matched_labels"] == ["books", "vec"]
    assert rows["k4"]["matched_labels"] == ["cheap", "vec"]
    assert rows["k1"]["score_vec"] == pytest.approx(1.0)


def test_not_wrapper(fixture_df):
    # NOT follows the reference's negative-op convention: a missing
    # field never matches, in either polarity (k2's NULL price drops)
    assert keys(fixture_df, Not(Cmp("price", Op.GT, 1000))) == ["k4"]


def test_phrase_pandas_mode_equivalent(spark):
    from hydraide_spark.functions.text import word_index
    from hydraide_spark.query import Phrase, translate
    from hydraide_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wi = docs.join(word_index(docs, "doc_id", "text"), "doc_id")
    words = ["stream", "table", "hash"]
    hof = wi.filter(translate(Phrase("word_index", words), wi))
    pand = wi.filter(translate(Phrase("word_index", words, pandas_mode=True), wi))
    a = sorted(r["doc_id"] for r in hof.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in pand.select("doc_id").collect())
    assert a == b and len(a) > 0
    # negation agrees too
    neg = wi.filter(translate(Phrase("word_index", words, negate=True, pandas_mode=True), wi))
    assert neg.count() == wi.count() - len(a)
