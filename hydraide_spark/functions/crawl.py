"""Crawl-archive ingestion (r14): WARC record parsing as pure column
expressions, completing the raw-crawl chain the HTML extractor opened —
WARC record -> HTTP response -> HTML body -> main text -> curation.

A distributed crawl reader lands ONE WARC record per row (the
record-splitting itself is the storage reader's framing job — on a real
cluster a WARC InputFormat or the producer's own record stream; the
100 TB shape is "a column of records", not "a column of whole files").
Everything after that framing is deterministic string surgery:
header-block split, case-insensitive header extraction, Content-Length
payload slicing (trailing CRLF padding between records must NOT leak
into the payload), HTTP status/header parsing for response records.
Every rule is a string/regex op inside the RE2 subset, so the DuckDB
oracle replays the parser rule-for-rule (the canonical_url / html
pattern).

Reference anchor: the reference engine ingests documents already
extracted (docs/features/query-engine.md); this module is part of the
beyond-parity LLM-curation layer (SURVEY.md §6) — the step that turns
CommonCrawl-shaped archives into the `documents` shape everything else
consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: header block terminator (WARC and HTTP share it)
_CRLF2 = "\r\n\r\n"


def _warc_header(head: Column, name: str) -> Column:
    """Case-insensitive header value from a header BLOCK (version line
    first, one header per CRLF line). Anchored on the preceding CRLF so
    a header name appearing inside another header's value can't match;
    '' when absent (both engines via COALESCE on the oracle side)."""
    return F.regexp_extract(head, f"(?i)\\r\\n{name}:[ ]*([^\\r\\n]*)", 1)


def warc_fields(record: Column) -> "dict[str, Column]":
    """Parse ONE WARC record string into its typed fields:

    - ``version``      first line (e.g. 'WARC/1.0'),
    - ``warc_type``    WARC-Type header,
    - ``target_uri``   WARC-Target-URI header,
    - ``warc_date``    WARC-Date header (string — parsing to timestamp
      is the caller's choice of session zone),
    - ``content_length`` Content-Length as INT (NULL when absent),
    - ``payload``      exactly Content-Length bytes after the header
      block — the slice is what keeps inter-record CRLF padding and
      any trailing garbage OUT of the payload (absent length = rest of
      the record, the lenient fallback),
    - ``http_status``  status code when the payload is an HTTP
      response (NULL otherwise),
    - ``mime``         the HTTP response's own Content-Type ('' for
      non-HTTP payloads),
    - ``body``         the HTTP body (payload minus HTTP headers) for
      HTTP payloads, else the raw payload.
    """
    head = F.substring_index(record, _CRLF2, 1)
    rest = F.substring(
        record, F.length(head) + F.lit(5), F.length(record)
    )  # +5: skip CRLFCRLF, 1-based
    # absent header -> regexp_extract's '' -> NULL, never an ANSI cast
    # error (the session runs ANSI; cast('' AS INT) raises)
    cl_raw = _warc_header(head, "Content-Length")
    cl = F.when(cl_raw.rlike("^[0-9]+$"), cl_raw.cast("int"))
    payload = F.when(cl.isNotNull(), F.substring(rest, F.lit(1), cl)).otherwise(
        rest
    )
    is_http = payload.startswith("HTTP/")
    http_head = F.substring_index(payload, _CRLF2, 1)
    body = F.when(
        is_http,
        F.substring(
            payload, F.length(http_head) + F.lit(5), F.length(payload)
        ),
    ).otherwise(payload)
    status_raw = F.regexp_extract(http_head, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
    status = F.when(is_http & status_raw.rlike("^[0-9]+$"), status_raw.cast("int"))
    mime = F.when(is_http, _warc_header(http_head, "Content-Type")).otherwise(
        F.lit("")
    )
    return {
        "version": F.substring_index(head, "\r\n", 1),
        "warc_type": _warc_header(head, "WARC-Type"),
        "target_uri": _warc_header(head, "WARC-Target-URI"),
        "warc_date": _warc_header(head, "WARC-Date"),
        "content_length": cl,
        "payload": payload,
        "http_status": status,
        "mime": mime,
        "body": body,
    }


def warc_extract(
    df: DataFrame, record_col: str = "record", id_col: str = "doc_id"
) -> DataFrame:
    """(id, version, warc_type, target_uri, warc_date, content_length,
    http_status, mime, body) for a record-per-row frame. One narrow
    projection — no shuffle, no UDF, map-only at any corpus size."""
    f = warc_fields(F.col(record_col))
    return df.select(
        F.col(id_col),
        f["version"].alias("version"),
        f["warc_type"].alias("warc_type"),
        f["target_uri"].alias("target_uri"),
        f["warc_date"].alias("warc_date"),
        f["content_length"].alias("content_length"),
        f["http_status"].alias("http_status"),
        f["mime"].alias("mime"),
        f["body"].alias("body"),
    )


def crawl_ingest_report(
    df: DataFrame,
    record_col: str = "record",
    id_col: str = "doc_id",
    min_words: int = 20,
) -> DataFrame:
    """The full raw-crawl admission pipeline over WARC records: parse
    -> keep HTTP 200 text/html responses -> canonicalize the target
    URI (functions/text.py::canonical_url) -> extract main content
    (html_main_text) -> keep docs with >= ``min_words`` extracted
    words. Returns (id, canonical_uri, n_words, text) for the
    survivors — the frame the dedup/quality family ingests next.
    Map-only; every rule SQL-replayable."""
    from .text import canonical_url, html_main_text

    parsed = warc_extract(df, record_col=record_col, id_col=id_col)
    pages = parsed.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith("text/html")
    )
    text, _n_kept, n_words = html_main_text(F.col("body"))
    return (
        pages.select(
            F.col(id_col),
            canonical_url(F.col("target_uri")).alias("canonical_uri"),
            text.alias("text"),
            n_words.cast("int").alias("n_words"),
        )
        .filter(F.col("n_words") >= int(min_words))
    )
