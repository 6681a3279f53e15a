"""Streaming crawl ingestion (r15, streaming/crawl_stream.py): archive
files landing in a directory -> framed records -> byte-exact parse ->
curation -> unified admission state, as one Structured Streaming query.
Batch/stream framing equivalence is pinned through the shared record
walk; admission effects are probed through the committed-marker
frontier like every other admission test."""

from __future__ import annotations

import os

from hydraide_spark.sources.warc import read_warc_files, write_warc_gz
from hydraide_spark.streaming.admission_stream import admission_exact_seen
from hydraide_spark.streaming.crawl_stream import (
    crawl_admission_items,
    run_crawl_ingest_loop,
)

PROBE_SCHEMA = "doc_id long, text string, payload binary"


def _rec(body: bytes, uri: str) -> bytes:
    pay = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + body
    )
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        + uri.encode("ascii")
        + b"\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "
        + str(len(pay)).encode("ascii")
        + b"\r\n\r\n"
        + pay
    )


def _page(n: int, words: str) -> bytes:
    html = (
        "<html><head><title>t</title></head><body><p>"
        + words
        + "</p></body></html>"
    ).encode("utf-8")
    return _rec(html, uri=f"http://ex{n}.com/p{n}")


def _words(tag: str, n: int = 30) -> str:
    return " ".join(f"{tag}{i} corpus content" for i in range(n // 3))


def test_crawl_stream_end_to_end(spark, tmp_path):
    in_dir = tmp_path / "landing"
    state = str(tmp_path / "adm")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    w1, w2, w3 = _words("alpha"), _words("bravo"), _words("carol")
    write_warc_gz(
        [_page(1, w1), _page(2, w2)], str(in_dir / "seg-00000.warc.gz")
    )

    q = run_crawl_ingest_loop(
        spark,
        str(in_dir),
        state,
        tau=0.6,
        max_files_per_trigger=1,
        checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()

        # the batch chain over the same directory defines the expected
        # admitted frame (shared record walk + shared pipeline): the
        # stream must have admitted exactly these texts
        batch = crawl_admission_items(
            read_warc_files(spark, str(in_dir))
        ).collect()
        assert len(batch) == 2
        assert {r.canonical_uri for r in batch} == {
            "http://ex1.com/p1",
            "http://ex2.com/p2",
        }
        probe = spark.createDataFrame(
            [(r.doc_id, r.text, None) for r in batch], PROBE_SCHEMA
        )
        seen = {
            r.doc_id: r.exact_seen
            for r in admission_exact_seen(spark, state, probe).collect()
        }
        assert set(seen.values()) == {1}

        # second segment: a REFETCH of page 1 (same uri+body -> same
        # doc_id, exact re-submission), a fresh page, and a too-short
        # page that must not be admitted
        write_warc_gz(
            [
                _page(1, w1),
                _page(3, w3),
                _rec(b"<html><body><p>tiny</p></body></html>", "http://ex9.com/p9"),
            ],
            str(in_dir / "seg-00001.warc.gz"),
        )
        q.processAllAvailable()

        batch2 = crawl_admission_items(
            read_warc_files(spark, str(in_dir))
        ).collect()
        # refetch collides on id by construction: 4 distinct admitted
        # ids across both segments, the short page filtered out
        ids = {r.doc_id for r in batch2}
        assert len(ids) == 3 and len(batch2) == 4
        texts = {r.doc_id: r.text for r in batch2}
        probe2 = spark.createDataFrame(
            [(d, t, None) for d, t in texts.items()]
            + [(999, "never ingested text at all", None)],
            PROBE_SCHEMA,
        )
        seen2 = {
            r.doc_id: r.exact_seen
            for r in admission_exact_seen(spark, state, probe2).collect()
        }
        assert seen2[999] == 0
        assert all(v == 1 for d, v in seen2.items() if d != 999)
    finally:
        q.stop()


def test_wet_write_read_round_trip(spark, tmp_path):
    """WET output: extracted docs -> .warc.wet.gz conversion records ->
    framed + parsed back byte-exactly. Multi-byte text pins the
    octet-counted Content-Length on the WRITE side this time."""
    from hydraide_spark.functions.crawl import warc_extract_binary
    from hydraide_spark.sources.warc import read_warc_files, write_wet_files

    data = [
        (f"http://ex{i}.com/p{i}", f"téxt {i} ☃ body naïve")
        for i in range(7)
    ]
    items = spark.createDataFrame(data, "canonical_uri string, text string")
    out = str(tmp_path / "wet")
    n = write_wet_files(items.repartition(3), out)
    assert n == 7

    back = warc_extract_binary(
        read_warc_files(spark, out, glob="*.wet.gz"), id_col="rec_no"
    ).collect()
    assert len(back) == 7
    # mime/charset are HTTP-RESPONSE attributes; conversion records
    # have no HTTP block — the body decodes via the lenient utf-8 path
    assert all(r.warc_type == "conversion" and r.mime == "" for r in back)
    assert {(r.target_uri, r.body) for r in back} == set(data)


def test_crawl_stream_wet_output(spark, tmp_path):
    """wet_dir leg: every committed epoch's admitted docs exist as WET
    conversion records under epoch=N/, readable back byte-exactly, and
    the epochs line up with the admission marker frontier (WET written
    BEFORE the marker — a consumer filtering to committed epochs never
    sees a partial epoch)."""
    import re

    from hydraide_spark.functions.crawl import warc_extract_binary
    from hydraide_spark.streaming.state_compact import committed_frontier

    in_dir = tmp_path / "landing"
    state = str(tmp_path / "adm")
    wet = str(tmp_path / "wet")
    os.makedirs(in_dir)
    write_warc_gz(
        [_page(1, _words("alpha")), _page(2, _words("bravo"))],
        str(in_dir / "seg-00000.warc.gz"),
    )
    write_warc_gz(
        [_page(3, _words("carol"))], str(in_dir / "seg-00001.warc.gz")
    )

    q = run_crawl_ingest_loop(
        spark,
        str(in_dir),
        state,
        tau=0.6,
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        wet_dir=wet,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = sorted(
        int(m.group(1))
        for d in os.listdir(wet)
        if (m := re.match(r"epoch=(\d+)$", d))
    )
    assert len(epochs) == 2
    committed = committed_frontier(state)
    assert committed is not None and set(epochs) <= set(committed)

    got = set()
    for e in epochs:
        rows = warc_extract_binary(
            read_warc_files(spark, os.path.join(wet, f"epoch={e}")),
            id_col="rec_no",
        ).collect()
        got |= {(r.target_uri, r.body) for r in rows}
    batch = crawl_admission_items(
        read_warc_files(spark, str(in_dir))
    ).collect()
    assert got == {(r.canonical_uri, r.text) for r in batch}
