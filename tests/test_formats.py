"""JSONL / CSV ingest-egress edges: explicit-schema round-trips against
the parquet canon, FAILFAST on malformed lines, PERMISSIVE quarantine."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from hydraide_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs_sorted(df):
    return [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.orderBy("doc_id").collect()
    ]


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema)
    assert back.schema == docs.schema  # explicit schema, no inference drift
    assert _docs_sorted(back) == _docs_sorted(docs)


def test_csv_roundtrip_matches_parquet(spark, tmp_path):
    # documents text is space-separated words (no quoting edge cases);
    # orders exercises timestamps + decimals through the csv edge
    docs = load_table(spark, SF, "documents")
    path = os.path.join(str(tmp_path), "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, docs.schema)
    assert back.schema == docs.schema
    assert _docs_sorted(back) == _docs_sorted(docs)


def test_jsonl_failfast_raises_on_malformed(spark, tmp_path):
    path = str(tmp_path / "bad")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("this is not json\n")
    schema = "doc_id BIGINT, text STRING"
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    with pytest.raises(Exception):
        read_jsonl(spark, path, st).collect()


def test_jsonl_permissive_quarantines_malformed(spark, tmp_path):
    path = str(tmp_path / "bad2")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("not json either\n")
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string("doc_id BIGINT, text STRING")
    back = read_jsonl(spark, path, st, permissive=True)
    rows = back.collect()
    assert len(rows) == 2
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(good) == 1 and good[0]["doc_id"] == 1
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "not json either"
    # caller's schema object must not grow the corrupt column (no mutation)
    assert [f.name for f in st.fields] == ["doc_id", "text"]


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Corpus generations gain columns: gen1 (id, text), gen2 adds
    lang. read_parquet_evolved unions the schemas and NULL-fills the
    old generation; plain single-path reads stay untouched."""
    from hydraide_spark.sources.formats import read_parquet_evolved

    g1, g2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    spark.createDataFrame([(1, "a")], "id long, text string").write.parquet(g1)
    spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    ).write.parquet(g2)
    df = read_parquet_evolved(spark, g1, g2)
    assert set(df.columns) == {"id", "text", "lang"}
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert rows == {1: None, 2: "en"}


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC as an additional interchange edge: a round-trip preserves
    values and schema exactly (Spark-native, no extra deps)."""
    src = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.25)], "id long, s string, v double"
    )
    p = str(tmp_path / "t.orc")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
