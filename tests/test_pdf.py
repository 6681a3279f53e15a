"""Dependency-free PDF text extraction (r15, functions/pdf.py):
round-trip through the repo's own writer across every feature switch,
the refusal contracts, and the grammar corners (escapes, octal, hex
strings, /Prev chains, multi-page trees)."""

from __future__ import annotations

import pytest

from hydraide_spark.functions.pdf import encode_pdf, pdf_text

PAGES = [
    ["Hello World", "Second line with (parens) and \\ backslash"],
    ["Page two", "accents: café naïve — dash"],
]
EXPECT = "\n".join("\n".join(p) for p in PAGES)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"compress": False},
        {"use_tj_arrays": True},
        {"incremental_noop": True},
        {"use_tj_arrays": True, "compress": False, "incremental_noop": True},
    ],
)
def test_pdf_round_trip_feature_matrix(kwargs):
    assert pdf_text(encode_pdf(PAGES, **kwargs)) == EXPECT


def test_pdf_string_grammar_corners():
    # nested parens via the writer's escape path
    pdf = encode_pdf([["(nested (deep) parens)"]])
    assert pdf_text(pdf) == "(nested (deep) parens)"
    # a REAL in-stream octal escape: patch the uncompressed content
    # with a same-length replacement so /Length stays valid
    raw = encode_pdf([["QQQQ"]], compress=False)
    assert b"(QQQQ)" in raw
    patched = raw.replace(b"(QQQQ)", b"(\\101)")
    assert len(patched) == len(raw)
    assert pdf_text(patched) == "A"


def test_pdf_refusals_are_loud():
    with pytest.raises(NotImplementedError, match="not a PDF"):
        pdf_text(b"junk bytes")
    with pytest.raises(NotImplementedError, match="cross-reference stream"):
        pdf_text(b"%PDF-1.5\nXXXX\nstartxref\n9\n%%EOF\n")
    enc = encode_pdf(PAGES).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R", 1
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_text(enc)
    # exotic content filter: rewrite the Filter name (same length so
    # offsets stay valid)
    lzw = encode_pdf(PAGES).replace(b"/FlateDecode", b"/LZWDecodeXX")
    with pytest.raises(NotImplementedError, match="filter"):
        pdf_text(lzw)


def test_pdf_spark_operator_refusal_column(spark):
    from hydraide_spark.functions.pdf import pdf_text_extract

    rows = [
        (1, bytearray(encode_pdf([["one page doc"]]))),
        (2, bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.text, r.error) for r in pdf_text_extract(df).collect()}
    assert got[1] == ("one page doc", None)
    assert got[2][0] is None and "not a PDF" in got[2][1]
