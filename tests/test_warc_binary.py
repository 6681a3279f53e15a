"""Byte-exact binary WARC parsing + charset resolution + file framing
(r15 — the r14 VERDICT's top two items). The string parser's
char-vs-octet failure mode is PINNED here as the documented contract
boundary; the binary path must be exact where it fails."""

from __future__ import annotations

import gzip

import pytest

from hydraide_spark.functions.crawl import (
    crawl_ingest_report,
    warc_extract,
    warc_extract_binary,
)
from hydraide_spark.sources.warc import (
    gzip_member_bytes,
    read_warc_files,
    split_warc_records,
    write_warc_gz,
)

TRAILER = b"\r\n\r\ntrailer junk never part of the payload"


def _rec(
    body: bytes,
    uri: str = "http://ex.com/page",
    ctype: bytes = b"text/html; charset=utf-8",
    status: bytes = b"200 OK",
) -> bytes:
    pay = b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        + uri.encode("ascii")
        + b"\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "
        + str(len(pay)).encode("ascii")
        + b"\r\n\r\n"
        + pay
    )


def test_warc_binary_byte_exact_where_char_slice_over_reads(spark):
    """WARC Content-Length counts OCTETS. On a multi-byte UTF-8 body
    the string path's character slice over-reads into the trailer —
    the exact leak the slice exists to prevent (pinned as the
    documented single-byte-only contract); the binary path slices
    bytes and is exact."""
    body_text = "héllo ☃ wörld — multibyte body with naïve café text"
    body = body_text.encode("utf-8")
    assert len(body) > len(body_text)  # the premise: octets != chars
    rec = _rec(body) + TRAILER

    sdf = spark.createDataFrame(
        [(1, rec.decode("utf-8"))], "doc_id long, record string"
    )
    srow = warc_extract(sdf).collect()[0]
    assert srow.body != body_text          # the pinned failure mode
    # over-read = octets-minus-chars extra characters: the separator
    # CRLFs plus the trailer's head leak into the body
    assert srow.body.startswith(body_text + "\r\n\r\n")

    bdf = spark.createDataFrame(
        [(1, bytearray(rec))], "doc_id long, record binary"
    )
    brow = warc_extract_binary(bdf).collect()[0]
    assert brow.body == body_text
    assert bytes(brow.body_bytes) == body
    assert brow.charset == "utf-8"
    assert brow.content_length == len(b"HTTP/1.1 200 OK\r\nContent-Type: "
                                      b"text/html; charset=utf-8\r\n\r\n") + len(body)
    assert brow.http_status == 200
    assert brow.target_uri == "http://ex.com/page"


def test_warc_binary_charset_resolution(spark):
    """Header charset param wins; <meta> sniff (first 1 KiB) fills in;
    windows-1252 decodes via the latin-1+translate mapping; an
    unsupported multi-byte charset falls back leniently (mojibake, not
    an exception); undeclared + valid UTF-8 decodes as UTF-8."""
    cases = [
        # (id, ctype, body_bytes, expected_charset, expected_text)
        (1, b"text/html; charset=windows-1252", b"caf\xe9 \x80uro",
         "windows-1252", "café €uro"),
        (2, b"text/html",
         b'<meta charset="windows-1252"><p>\x80 price</p>',
         "windows-1252", '<meta charset="windows-1252"><p>€ price</p>'),
        (3, b"text/html; charset=shift_jis", b"\x83e\x83X\x83g",
         "shift_jis", "\x83e\x83X\x83g"),  # lenient latin-1 projection
        (4, b"text/html", "undeclared but valid utf-8 ☃".encode("utf-8"),
         "", "undeclared but valid utf-8 ☃"),
        (5, b"text/html; charset=US-ASCII", b"plain ascii",
         "us-ascii", "plain ascii"),
        (6, b"text/html; charset=ISO-8859-1", b"na\xefve",
         "iso-8859-1", "naïve"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(_rec(b, ctype=ct))) for i, ct, b, _, _ in cases],
        "doc_id long, record binary",
    )
    got = {r.doc_id: r for r in warc_extract_binary(df).collect()}
    for i, _, b, want_cs, want_text in cases:
        assert got[i].charset == want_cs, i
        assert got[i].body == want_text, i
        assert bytes(got[i].body_bytes) == b, i


def test_split_warc_records_walk():
    """Pure-bytes record walk: Content-Length-driven jumps, separator
    CRLF consumption, the lenient no-length tail, and robustness to a
    body that CONTAINS the header-terminator byte sequence."""
    r1 = _rec(b"body with \r\n\r\n embedded terminator bytes")
    r2 = _rec("multibyte ☃ body".encode("utf-8"))
    nolen = b"WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nrest of stream is mine"
    stream = r1 + b"\r\n\r\n" + r2 + b"\r\n\r\n" + nolen
    got = split_warc_records(stream)
    assert got == [r1, r2, nolen]
    assert split_warc_records(b"") == []
    assert split_warc_records(b"\r\n\r\n") == []


def test_gzip_member_walk():
    """Member-at-a-time archives and whole-stream single members both
    decompress; a truncated tail keeps the complete members."""
    a, b = b"alpha" * 100, b"beta" * 77
    mem = b"".join(gzip.compress(x, mtime=0) for x in (a, b))
    assert gzip_member_bytes(mem) == a + b
    assert gzip_member_bytes(gzip.compress(a + b)) == a + b
    assert gzip_member_bytes(mem[: len(gzip.compress(a, mtime=0)) + 5]) == a


def test_read_warc_files_round_trip(spark, tmp_path):
    """.warc.gz (member-per-record), single-member .gz and plain
    .warc files all frame back to the exact pre-split records."""
    recs = [
        _rec("héllo ☃ multibyte".encode("utf-8")),
        _rec(b"plain ascii body", uri="http://b.com/x"),
        _rec(b"x" * 257, ctype=b"application/pdf"),
    ]
    write_warc_gz(recs, str(tmp_path / "a.warc.gz"))
    stream = b"".join(r + b"\r\n\r\n" for r in recs)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(stream, mtime=0))
    (tmp_path / "c.warc").write_bytes(stream)

    got = read_warc_files(spark, str(tmp_path)).collect()
    by_file = {}
    for r in got:
        by_file.setdefault(r.path.split("/")[-1], []).append(
            (r.rec_no, bytes(r.record))
        )
    for name in ("a.warc.gz", "b.warc.gz", "c.warc"):
        assert [b for _, b in sorted(by_file[name])] == recs, name


def test_crawl_ingest_binary_end_to_end(spark, tmp_path):
    """Files -> framing -> byte-exact parse -> charset decode -> main
    content -> admitted docs, on a corpus where char-slicing would
    corrupt every body (multibyte page text)."""
    page = (
        "<html><body><div><p>"
        "Füße schöne Grüße — résumé naïve ☃ words continue here with "
        "plenty of extra content so the extractor keeps this block of "
        "at least twenty real words in total for admission today"
        "</p></div></body></html>"
    )
    recs = [
        _rec(page.encode("utf-8"), uri=f"http://s{i}.com/p{i}")
        for i in range(4)
    ]
    recs.append(_rec(b"gone", uri="http://s9.com/gone", status=b"404 Not Found"))
    write_warc_gz(recs, str(tmp_path / "seg.warc.gz"))

    frame = read_warc_files(spark, str(tmp_path))
    out = crawl_ingest_report(frame, record_col="record", id_col="rec_no",
                              binary=True).collect()
    assert len(out) == 4
    assert {r.canonical_uri for r in out} == {
        f"http://s{i}.com/p{i}" for i in range(4)
    }
    for r in out:
        assert "Füße schöne Grüße — résumé naïve ☃" in r.text
        assert r.n_words >= 20


def test_crawl_ingest_cache_matches_uncached(spark, tmp_path):
    """r15 optimization pin: cache=True (the golden/bench boundary
    shape — parse and extract persisted once) returns exactly the
    uncached single-pass rows, and repeat calls stay correct."""
    page = (
        "<html><body><div><p>"
        "Füße schöne Grüße — résumé naïve ☃ words continue here with "
        "plenty of extra content so the extractor keeps this block of "
        "at least twenty real words in total for admission today"
        "</p></div></body></html>"
    )
    recs = [
        _rec(page.encode("utf-8"), uri=f"http://c{i}.com/p{i}")
        for i in range(3)
    ]
    write_warc_gz(recs, str(tmp_path / "seg.warc.gz"))
    frame = read_warc_files(spark, str(tmp_path))

    def rows(cache):
        return sorted(
            (r.canonical_uri, r.text, r.n_words)
            for r in crawl_ingest_report(
                frame, record_col="record", id_col="rec_no",
                binary=True, cache=cache,
            ).collect()
        )

    plain = rows(cache=False)
    assert rows(cache=True) == plain
    # repeat call with the same plan: CacheManager dedupe, same rows
    assert rows(cache=True) == plain
