"""WARC file framing (r15): ``.warc`` / ``.warc.gz`` archive files ->
one BINARY record per row — the step the r14 crawl chain declared "the
storage reader's framing job", now implemented so
``crawl_ingest_report(binary=True)`` runs end-to-end on an actual
CommonCrawl-shaped dump.

Shape: the ``binaryFile`` source lands one row per FILE; an
Arrow-batched ``mapInPandas`` (the multimodal ``real_decode`` pattern)
walks gzip members and record boundaries in plain Python bytes and
yields records. Parallelism is per-file — the WARC file is the atomic
compression unit, and CommonCrawl ships ~1 GiB segment files, so a
100 TB crawl is ~100K independent rows into this map: plenty of
partitions, zero shuffle, no driver-side byte ever. Everything after
framing is the byte-exact column-expression parser
(functions/crawl.py::warc_extract_binary).

Format facts the walkers encode (ISO 28500 / the CommonCrawl
convention):

- a WARC file is records back to back; each record = header block +
  CRLFCRLF + exactly Content-Length payload octets, and TWO CRLFs
  separate records;
- ``.warc.gz`` compresses record-at-a-time — one gzip member per
  record, members concatenated — but a whole-file single member is
  equally legal, so the member walk and the record walk are
  independent steps (either handles the other's degenerate case).

Reference anchor: the reference engine ingests pre-extracted documents
(docs/features/query-engine.md); this source belongs to the
beyond-parity LLM-curation layer (SURVEY.md §6).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterable, Iterator, List

from pyspark.sql import DataFrame, SparkSession

#: Content-Length inside a header BLOCK only (multiline, case-insensitive,
#: anchored at line start so a value mentioning the header name can't match)
_CL_RE = re.compile(rb"(?im)^content-length:[ \t]*([0-9]+)[ \t]*\r?$")


def gzip_member_bytes(data: bytes) -> bytes:
    """Concatenated gzip members -> the decompressed stream. Walks
    member-by-member via ``zlib.decompressobj(wbits=31)`` +
    ``unused_data`` (the stdlib's documented multi-member idiom); a
    truncated trailing member keeps whatever decoded (lenient — a
    partial tail record is dropped later by its own short length, not
    by failing the whole file)."""
    parts: List[bytes] = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            parts.append(d.decompress(data))
            parts.append(d.flush())
        except zlib.error:
            break  # corrupt tail: keep the members that decoded
        if not d.eof:
            break  # truncated trailing member
        data = d.unused_data
    return b"".join(parts)


def split_warc_records(data: bytes) -> List[bytes]:
    """Record-boundary walk over a decompressed WARC stream: consume
    inter-record CRLFs, find the header block, jump exactly
    Content-Length octets past its terminator. A record without
    Content-Length is invalid per ISO 28500 — the walk lenient-consumes
    the rest of the stream as that record (same fallback as the column
    parser). Pure bytes -> list; no Spark, hypothesis-testable."""
    out: List[bytes] = []
    i, n = 0, len(data)
    while i < n:
        while data.startswith(b"\r\n", i):
            i += 2
        if i >= n:
            break
        j = data.find(b"\r\n\r\n", i)
        if j < 0:
            out.append(data[i:])
            break
        m = _CL_RE.search(data, i, j)
        end = (j + 4 + int(m.group(1))) if m else n
        out.append(data[i : min(end, n)])
        i = end
    return out


def read_warc_files(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """(path, rec_no, record BINARY) for every record in every
    ``.warc`` / ``.warc.gz`` file under ``path``. ``rec_no`` is the
    record's position within its file — (path, rec_no) is the natural
    record id when the archive carries none.

    Feed the result to ``functions.crawl.warc_extract_binary`` /
    ``crawl_ingest_report(binary=True)``. On a real cluster point
    ``path`` at object storage; the binaryFile source distributes
    whole files (one file = one row = one task unit), so executor
    memory must hold a file's decompressed bytes — the CommonCrawl
    ~1 GiB segment convention fits comfortably."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        _records_walk, "path string, rec_no long, record binary"
    )


def _records_walk(
    batches: Iterable["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """(path, content) file rows -> (path, rec_no, record) record rows;
    shared by the batch reader and the streaming source (the framing
    rules must be ONE implementation — a drift between them would make
    a stream re-ingest frame records differently than the backfill)."""
    import pandas as pd

    for pdf in batches:
        paths: List[str] = []
        recnos: List[int] = []
        recs: List[bytes] = []
        for p, content in zip(pdf["path"], pdf["content"]):
            raw = bytes(content)
            if str(p).endswith(".gz"):
                raw = gzip_member_bytes(raw)
            for k, r in enumerate(split_warc_records(raw)):
                paths.append(str(p))
                recnos.append(k)
                recs.append(r)
        yield pd.DataFrame({"path": paths, "rec_no": recnos, "record": recs})


#: the binaryFile source's fixed schema — readStream file sources
#: require an explicit schema, and binaryFile's is documented/stable
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_files_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """Streaming twin of :func:`read_warc_files`: new archive files
    landing under ``path`` become record rows in micro-batches (the
    CommonCrawl delivery shape — segments appear as a crawl
    progresses). Same per-file parallelism, same shared record walk;
    ``max_files_per_trigger`` bounds a micro-batch for test
    determinism and backfill pacing."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _records_walk, "path string, rec_no long, record binary"
    )


def write_warc_gz(
    records: List[bytes], path: str, compresslevel: int = 9
) -> None:
    """Write records as a record-at-a-time-compressed ``.warc.gz``
    (one gzip member per record, the CommonCrawl convention), each
    record followed by the two separator CRLFs. Driver-side test/
    fixture utility — production archives come from the crawler.

    ``compresslevel`` trades CPU for bytes; any level round-trips
    byte-exactly through the member walk (the decoder never sees the
    level), and the bytes stay deterministic per level (mtime=0)."""
    import gzip as _gzip
    import io
    import os

    buf = io.BytesIO()
    for r in records:
        member = io.BytesIO()
        # mtime=0: deterministic bytes (gzip headers carry a timestamp)
        with _gzip.GzipFile(
            fileobj=member, mode="wb", mtime=0, compresslevel=compresslevel
        ) as gz:
            gz.write(r + b"\r\n\r\n")
        buf.write(member.getvalue())
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(buf.getvalue())
    os.replace(tmp, path)


def wet_record(
    uri: str, text: str, date: str = "2026-01-01T00:00:00Z"
) -> bytes:
    """One WET-style ``conversion`` record (the CommonCrawl companion
    format for extracted text): WARC headers + UTF-8 plain-text
    payload, Content-Length in OCTETS (the byte-exact rule this repo
    learned the hard way on the parse side)."""
    body = text.encode("utf-8")
    return (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "
        + uri.encode("ascii")
        + b"\r\nWARC-Date: "
        + date.encode("ascii")
        + b"\r\nContent-Type: text/plain; charset=utf-8\r\nContent-Length: "
        + str(len(body)).encode("ascii")
        + b"\r\n\r\n"
        + body
    )


def write_wet_files(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "canonical_uri",
    text_col: str = "text",
    date: str = "2026-01-01T00:00:00Z",
) -> int:
    """Write an extracted-documents frame as ``.warc.wet.gz`` files —
    the curation pipeline's ARCHIVE-SHAPED output (ingest consumes
    WARC, this emits its WET complement, so a hydraide_spark curation
    run slots into an existing CommonCrawl-consuming toolchain on both
    ends). Executor-side: one file per partition, records ordered by
    URI within the file (deterministic bytes given a deterministic
    partitioning), no driver byte. Returns the record count written.

    Round-trip contract: :func:`read_warc_files` over ``out_dir`` +
    ``functions.crawl.warc_extract_binary`` recovers (uri, text)
    exactly — pinned in tests/test_crawl_stream.py."""
    import os

    import pandas as pd  # noqa: F401  (mapInPandas batch type)

    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            rows.extend(zip(pdf["__uri"], pdf["__text"]))
        rows.sort(key=lambda r: str(r[0]))
        if rows:
            write_warc_gz(
                [wet_record(str(u), str(t), date=date) for u, t in rows],
                os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz"),
            )
        yield pd.DataFrame({"n": [len(rows)]})

    from pyspark.sql import functions as F

    counted = (
        df.select(
            F.col(uri_col).alias("__uri"), F.col(text_col).alias("__text")
        )
        .mapInPandas(_write, "n long")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    return int(counted[0]["n"] or 0)
