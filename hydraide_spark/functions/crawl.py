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


def _warc_grammar(s: Column) -> "dict[str, Column]":
    """The shared record grammar over a record STRING: header-block
    split, Content-Length slice (in the string's own length unit —
    CHARACTERS for a true string, BYTES when ``s`` is an ISO-8859-1
    byte projection), HTTP head/body split. Both parse paths are this
    one function; only the length semantics of the input differ."""
    head = F.substring_index(s, _CRLF2, 1)
    rest = F.substring(
        s, F.length(head) + F.lit(5), F.length(s)
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


def warc_fields(record: Column) -> "dict[str, Column]":
    """Parse ONE WARC record string into its typed fields:

    - ``version``      first line (e.g. 'WARC/1.0'),
    - ``warc_type``    WARC-Type header,
    - ``target_uri``   WARC-Target-URI header,
    - ``warc_date``    WARC-Date header (string — parsing to timestamp
      is the caller's choice of session zone),
    - ``content_length`` Content-Length as INT (NULL when absent),
    - ``payload``      the Content-Length-driven slice after the
      header block — what keeps inter-record CRLF padding and any
      trailing garbage OUT of the payload (absent length = rest of
      the record, the lenient fallback),
    - ``http_status``  status code when the payload is an HTTP
      response (NULL otherwise),
    - ``mime``         the HTTP response's own Content-Type ('' for
      non-HTTP payloads),
    - ``body``         the HTTP body (payload minus HTTP headers) for
      HTTP payloads, else the raw payload.

    .. warning:: ASCII / single-byte framing ONLY. WARC Content-Length
       counts OCTETS but a Spark string slice counts CHARACTERS, so on
       any multi-byte (UTF-8) payload this slice over-reads into the
       inter-record padding. This string path exists as the
       SQL-replayable oracle twin over synthesized single-byte
       corpora; real archives go through :func:`warc_fields_binary`
       (byte-exact, charset-resolving). tests pin the failure mode.
    """
    from ._cache import column_memo

    return dict(
        column_memo(
            ("warc_fields", str(record)), lambda: _warc_grammar(record)
        )
    )


# --- byte-exact binary parsing + charset resolution (r15) ----------------------

#: windows-1252 differs from ISO-8859-1 ONLY at 0x80-0x9F; five bytes
#: (81 8D 8F 90 9D) are undefined and pass through unchanged (the
#: WHATWG decoder behavior). Computed from Python's own cp1252 codec
#: at import — driver-side, deterministic, never recomputed engine-side.
_CP1252_BYTES = [b for b in range(0x80, 0xA0) if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_CP1252_SRC = "".join(chr(b) for b in _CP1252_BYTES)
_CP1252_DST = "".join(bytes([b]).decode("cp1252") for b in _CP1252_BYTES)


def _charset_of(mime: Column, body_l1: Column) -> Column:
    """Declared charset, lowercased: the Content-Type ``charset=``
    parameter wins; else an HTML ``<meta>`` declaration within the
    first 1024 BYTES of the body (both the ``<meta charset=..>`` and
    the http-equiv ``content="..; charset=.."`` forms land on the same
    pattern — meta tags are ASCII, so the latin-1 projection is safe
    to sniff); '' when undeclared."""
    hdr = F.lower(
        F.regexp_extract(mime, "(?i)charset=[\"']?([A-Za-z0-9_\\-]+)", 1)
    )
    meta = F.lower(
        F.regexp_extract(
            F.substring(body_l1, F.lit(1), F.lit(1024)),
            "(?i)<meta[^>]*charset=[\"']?([A-Za-z0-9_\\-]+)",
            1,
        )
    )
    return F.when(hdr != "", hdr).otherwise(meta)


def _decode_body(body_l1: Column, charset: Column) -> Column:
    """Body bytes (carried as their ISO-8859-1 char projection) ->
    text under the resolved charset. Natively decoded: utf-8/us-ascii
    (validity-guarded — crawl garbage never raises), iso-8859-1/latin1
    (the projection itself IS the decode), windows-1252/cp1252
    (latin-1 + one ``translate`` over the 27 differing 0x80-0x9F code
    points). Every other label — including undeclared — uses the
    lenient crawler rule: decode UTF-8 when the bytes are valid UTF-8,
    else keep the latin-1 projection (never lossy, never raising; a
    multi-byte legacy charset like Shift-JIS comes out mojibake, the
    honest best-effort without a JVM charset table)."""
    body_bin = F.encode(body_l1, "ISO-8859-1")
    lenient = F.when(
        F.is_valid_utf8(body_bin), F.decode(body_bin, "UTF-8")
    ).otherwise(body_l1)
    return (
        F.when(
            charset.isin("iso-8859-1", "latin-1", "latin1", "iso8859-1", "l1"),
            body_l1,
        )
        .when(
            charset.isin("windows-1252", "cp1252", "x-cp1252"),
            F.translate(body_l1, _CP1252_SRC, _CP1252_DST),
        )
        .otherwise(lenient)
    )


def warc_fields_binary(record: Column) -> "dict[str, Column]":
    """Byte-exact WARC parse of a BINARY record column (r15 — the r14
    VERDICT's one substantive defect: :func:`warc_fields` slices
    Content-Length as CHARACTERS, but WARC lengths are OCTETS, so any
    multi-byte UTF-8 payload over-read into the inter-record padding).

    The record is projected through ISO-8859-1 — a BIJECTIVE
    byte<->char mapping — so every string offset in the shared grammar
    IS a byte offset and the Content-Length slice is octet-exact;
    header names/values are ASCII per ISO 28500, so header extraction
    is unaffected by the projection. Fields beyond :func:`warc_fields`:

    - ``charset``    resolved declaration (Content-Type param, then a
      ``<meta>`` tag in the first 1 KiB; '' when undeclared),
    - ``body``       the DECODED text under that charset (see
      :func:`_decode_body` for the supported set + lenient fallback),
    - ``body_bytes`` the raw payload-body OCTETS (exact round-trip of
      the latin-1 projection — the input for binary consumers like
      the multimodal decoders).

    Still zero UDFs: projection, slicing, charset choice and decode
    are all column expressions — map-only at any corpus size."""
    from ._cache import column_memo

    def _build() -> "dict[str, Column]":
        f = _warc_grammar(F.decode(record, "ISO-8859-1"))
        body_l1 = f.pop("body")
        charset = _charset_of(f["mime"], body_l1)
        f["charset"] = charset
        f["body"] = _decode_body(body_l1, charset)
        f["body_bytes"] = F.encode(body_l1, "ISO-8859-1")
        return f

    # the grammar is a pure (large) expression tree over `record` —
    # memo it per context/input expression; copy so callers may pop
    return dict(
        column_memo(("warc_fields_binary", str(record)), _build)
    )


def warc_extract_binary(
    df: DataFrame, record_col: str = "record", id_col: str = "doc_id"
) -> DataFrame:
    """(id, version, warc_type, target_uri, warc_date, content_length,
    http_status, mime, charset, body, body_bytes) for a BINARY
    record-per-row frame (the :func:`hydraide_spark.sources.warc.
    read_warc_files` output shape). One narrow projection — no
    shuffle, no UDF, map-only at any corpus size."""
    f = warc_fields_binary(F.col(record_col))
    return df.select(
        F.col(id_col),
        f["version"].alias("version"),
        f["warc_type"].alias("warc_type"),
        f["target_uri"].alias("target_uri"),
        f["warc_date"].alias("warc_date"),
        f["content_length"].alias("content_length"),
        f["http_status"].alias("http_status"),
        f["mime"].alias("mime"),
        f["charset"].alias("charset"),
        f["body"].alias("body"),
        f["body_bytes"].alias("body_bytes"),
    )


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
    binary: bool = False,
    cache: bool = False,
) -> DataFrame:
    """The full raw-crawl admission pipeline over WARC records: parse
    -> keep HTTP 200 text/html responses -> canonicalize the target
    URI (functions/text.py::canonical_url) -> extract main content
    (html_main_text) -> keep docs with >= ``min_words`` extracted
    words. Returns (id, canonical_uri, n_words, text) for the
    survivors — the frame the dedup/quality family ingests next.
    Map-only; every rule SQL-replayable.

    ``binary=True`` parses a BINARY record column byte-exactly with
    charset resolution (:func:`warc_extract_binary`) — the path real
    archives take; the default string path is the documented
    single-byte oracle twin.

    ``cache=True`` adds two cache boundaries (r15 optimization, the
    CLAUDE.md inlining gotcha): without them Catalyst inlines the
    parse grammar into the page filter AND the extract projection
    (big enough to fail janino compile — interpreted fallback), and
    the ``n_words`` filter re-inlines the whole extract chain below
    itself, so parse+extract ran ~3x per row (measured 5.0 s -> 1.6 s
    on the pipeline golden at sf0.1). Persisting the parsed fields and
    the extracted survivors runs each stage once; generation-evicted
    per call site (functions/_cache). OFF by default and ignored for
    streaming frames: Spark's CacheManager dedupes by logical plan, so
    a persisted parse over a MUTABLE input directory would serve stale
    records to a later call that re-lists the same path (the streaming
    backfill probe hit exactly this) — opt in only when the input
    frame is immutable for the session (the goldens' synthesized
    corpora; deterministic scratch archives)."""
    from ._cache import pin_latest
    from .text import canonical_url, html_main_text

    extract = warc_extract_binary if binary else warc_extract
    parsed = extract(df, record_col=record_col, id_col=id_col)
    use_cache = cache and not parsed.isStreaming
    pinned = []
    if use_cache:
        parsed = parsed.persist()
        pinned.append(parsed)
    pages = parsed.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("mime").startswith("text/html")
    )
    text, _n_kept, n_words = html_main_text(F.col("body"))
    sel = pages.select(
        F.col(id_col),
        canonical_url(F.col("target_uri")).alias("canonical_uri"),
        text.alias("text"),
        n_words.cast("int").alias("n_words"),
    )
    if use_cache:
        sel = sel.persist()
        pinned.append(sel)
        pin_latest("crawl.crawl_ingest_report", *pinned)
    return sel.filter(F.col("n_words") >= int(min_words))


# --- robots.txt politeness rules (r14) ----------------------------------------

#: regex metacharacters escaped before '*' wildcards are translated —
#: a FIXED list shared with the SQL oracle so both engines build the
#: same pattern string
_ROBOTS_ESCAPES = [
    ("\\", "\\\\"), (".", "\\."), ("+", "\\+"), ("?", "\\?"),
    ("(", "\\("), (")", "\\)"), ("[", "\\["), ("]", "\\]"),
    ("{", "\\{"), ("}", "\\}"), ("|", "\\|"), ("^", "\\^"),
]


def _robots_grouped(
    df: DataFrame, host_col: str, robots_col: str
) -> "tuple[DataFrame, DataFrame]":
    """The shared RFC 9309 group recovery: robots bodies -> (grouped,
    uas) where ``grouped`` is one row per non-comment line (host, ln,
    key, value, gid) and ``uas`` maps (host, gid) -> agent (CONSECUTIVE
    User-agent lines share the group). Recovered with WINDOW functions
    over (host, line_no) — a new group starts at a user-agent line
    whose predecessor is not one — so the whole parse is declarative
    (shuffle on host only) and SQL-replayable; no fold state."""
    from pyspark.sql import Window as W

    # CRLF endings are the wire norm (r15 ADVICE fix): a trailing '\r'
    # left inside pattern values would make every rule unmatched — a
    # FAIL-OPEN politeness violation. Strip all CRs before the line
    # split (robots values never meaningfully contain a bare '\r');
    # the oracle replays replace(robots, chr(13), '').
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.replace(F.col(robots_col), F.lit("\r"), F.lit("")), "\n")
        ).alias("ln", "raw"),
    )
    cleaned = lines.select(
        "host",
        "ln",
        F.trim(F.substring_index(F.col("raw"), "#", 1)).alias("line"),
    ).select(
        "host",
        "ln",
        F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("key"),
        F.trim(
            F.regexp_extract(F.col("line"), r"^[^:]*:(.*)$", 1)
        ).alias("value"),
    )
    w = W.partitionBy("host").orderBy("ln")
    is_ua = F.col("key") == "user-agent"
    grouped = cleaned.withColumn(
        "new_group",
        (is_ua & (F.lag("key").over(w).isNull() | (F.lag("key").over(w) != "user-agent"))).cast(
            "int"
        ),
    ).withColumn("gid", F.sum("new_group").over(w))
    uas = (
        grouped.filter(is_ua & (F.col("value") != ""))
        .select("host", "gid", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    return grouped, uas


def robots_rules(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots"
) -> DataFrame:
    """Parse robots.txt bodies into flat (host, agent, pattern, allow,
    plen) rule rows — the RFC 9309 grammar subset a frontier needs:
    ``User-agent`` lines open a group (CONSECUTIVE user-agent lines
    share the group's rules), ``Allow``/``Disallow`` lines attach to
    the open group, ``#`` comments and unknown keys are ignored, an
    empty Disallow value matches nothing (allow-all, per the RFC).
    Patterns keep their '*' wildcards and trailing '$' anchors for
    :func:`robots_allowed` to compile. Group recovery:
    :func:`_robots_grouped` (declarative window functions)."""
    grouped, uas = _robots_grouped(df, host_col, robots_col)
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "gid",
        F.col("value").alias("pattern"),
        (F.col("key") == "allow").alias("allow"),
        F.length("value").alias("plen"),
    )
    return uas.join(rules, ["host", "gid"]).select(
        "host", "agent", "pattern", "allow", "plen"
    )


def robots_crawl_delays(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots"
) -> DataFrame:
    """Per-group ``Crawl-delay`` directives (r15 — r14 VERDICT #5) as
    (host, agent, crawl_delay DOUBLE) rows through the same group
    recovery as :func:`robots_rules`. Values must be plain decimal
    seconds (``^[0-9]+(\\.[0-9]+)?$``); anything else is ignored (the
    de-facto crawler behavior for this non-RFC extension). Duplicate
    delays inside one group keep the MAX — the most polite reading.
    EVERY agent group is present — a group without a valid delay
    carries NULL — so :func:`robots_crawl_delay_for` can apply the
    RFC's group-selection rule (a delay-less specific group does NOT
    fall back to the '*' group's delay)."""
    grouped, uas = _robots_grouped(df, host_col, robots_col)
    delays = (
        grouped.filter(
            (F.col("key") == "crawl-delay")
            & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
        )
        .groupBy("host", "gid")
        .agg(F.max(F.col("value").cast("double")).alias("crawl_delay"))
    )
    return uas.join(delays, ["host", "gid"], "left").select(
        "host", "agent", "crawl_delay"
    )


def robots_crawl_delay_for(delays: DataFrame, agent: str) -> DataFrame:
    """The frontier's per-host delay decision for one crawler: select
    the most-specific group set (exact ``agent`` beats ``*`` — the
    same rule :func:`robots_allowed` applies to patterns; a specific
    group WITHOUT a delay deliberately yields no row, it does not fall
    back to '*'), then MAX across the selected groups. Returns (host,
    crawl_delay); hosts with no valid delay emit nothing."""
    a = str(agent).lower()
    r = delays.filter(F.col("agent").isin(a, "*")).withColumn(
        "spec", (F.col("agent") == a).cast("int")
    )
    best = r.groupBy("host").agg(F.max("spec").alias("best_spec"))
    return (
        r.join(best, "host")
        .filter(F.col("spec") == F.col("best_spec"))
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
        .filter(F.col("crawl_delay").isNotNull())
    )


def polite_fetch_schedule(
    urls: DataFrame,
    host_delays: DataFrame,
    default_delay: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """Assign each frontier URL a politeness slot (r15 — the step
    after :func:`robots_allowed` + :func:`robots_crawl_delay_for`):
    URLs are ranked per host (deterministic: ordered by the URL
    string) and scheduled ``(rank-1) * delay`` seconds into the
    host's fetch window, where ``delay`` is the host's resolved
    Crawl-delay or ``default_delay``. Returns (url, host, rank,
    delay_sec, fetch_offset_sec).

    Plan shape: one broadcast-joinable (host, crawl_delay) frame +
    ONE window partitioned by host — the host is the politeness
    serialization unit, so per-host ranking is the exact parallelism
    the problem itself has; no global window, no cartesian. Offsets
    multiply exact small-decimal doubles by integer ranks —
    bit-identical across engines."""
    u = urls.select(
        F.col(url_col),
        F.lower(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*).*$", 1
            )
        ).alias("host"),
    )
    from pyspark.sql import Window as W

    d = u.join(host_delays, "host", "left").withColumn(
        "delay_sec",
        F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
    )
    w = W.partitionBy("host").orderBy(url_col)
    return d.withColumn("rank", F.row_number().over(w)).select(
        F.col(url_col),
        F.col("host"),
        F.col("rank"),
        F.col("delay_sec"),
        ((F.col("rank") - F.lit(1)) * F.col("delay_sec")).alias(
            "fetch_offset_sec"
        ),
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots"
) -> DataFrame:
    """Distinct (host, sitemap) discovery rows (r15 — r14 VERDICT #5).
    ``Sitemap`` directives are group-INDEPENDENT per the sitemaps
    protocol, so no agent column; URL values keep their case (only the
    key is lowercased by the line parser). Caveat shared with the
    oracle: '#' starts a comment, so a (spec-invalid) fragment in a
    sitemap URL would be truncated."""
    grouped, _uas = _robots_grouped(df, host_col, robots_col)
    return (
        grouped.filter((F.col("key") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap"))
        .distinct()
    )


def _robots_pattern_regex(pattern: Column) -> Column:
    """robots pattern -> anchored regex, the deterministic translation
    shared with the oracle: escape regex metacharacters (fixed list),
    '*' -> '.*', a trailing '$' stays an end anchor (escaped first,
    un-escaped back when terminal)."""
    p = pattern
    for lit_ch, esc in _ROBOTS_ESCAPES:
        p = F.replace(p, F.lit(lit_ch), F.lit(esc))
    p = F.replace(p, F.lit("$"), F.lit("\\$"))
    p = F.replace(p, F.lit("*"), F.lit(".*"))
    # terminal '$' anchor: the RFC's only use of '$'
    p = F.when(
        p.endswith("\\$"),
        F.concat(F.substring(p, F.lit(1), F.length(p) - F.lit(2)), F.lit("$")),
    ).otherwise(p)
    return F.concat(F.lit("^"), p)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Frontier politeness decision per URL under parsed robots rules:

    - group selection: the crawler's groups are the host's rules whose
      agent equals ``agent`` (lowercased) when any exist, else the
      ``*`` groups (RFC 9309 most-specific-group rule at the
      exact-token/* granularity this parser keeps),
    - rule matching: the URL's PATH (query included, fragment not)
      against the compiled pattern,
    - precedence: LONGEST pattern wins; at equal length Allow wins
      (the documented Google tiebreak),
    - no matching rule (or no rules for the host at all) => allowed.

    Returns ONE row per DISTINCT url: (url, host, path, allowed) —
    duplicate input URLs collapse in the decision groupBy and caller
    columns are NOT carried (r15 ADVICE contract fix: this is the
    documented shape, and callers join the decision back on
    ``url_col`` — the robots_frontier_filter golden shape; the dedup
    costs nothing extra because the decision aggregate already
    shuffles on url). Plan shape: one equi-join on host (rules frames
    are tiny — AQE broadcasts), a per-URL max-struct instead of a
    window, no cartesian anywhere."""
    a = str(agent).lower()
    path0 = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1
    )
    u = urls.select(
        F.col(url_col),
        F.lower(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*).*$", 1
            )
        ).alias("host"),
        F.when(path0 == "", F.lit("/")).otherwise(path0).alias("path"),
    )
    # most-specific group per host: exact agent beats '*'
    r = rules.filter(F.col("agent").isin(a, "*")).withColumn(
        "spec", (F.col("agent") == a).cast("int")
    )
    best_spec = r.groupBy("host").agg(F.max("spec").alias("best_spec"))
    r = r.join(best_spec, "host").filter(F.col("spec") == F.col("best_spec"))
    matched = u.join(r, "host", "left").withColumn(
        "hit",
        F.col("pattern").isNotNull()
        & F.regexp_like(
            F.col("path"), _robots_pattern_regex(F.col("pattern"))
        ),
    )
    # rlike with a non-literal pattern: per-row regex compile — fine
    # for rule-sized frames; the hit rows collapse to one decision by
    # (plen, allow) max-struct
    decided = matched.groupBy(url_col, "host", "path").agg(
        F.max(
            F.when(
                F.col("hit"),
                F.struct(
                    F.col("plen").alias("plen"),
                    F.col("allow").cast("int").alias("al"),
                ),
            )
        ).alias("win")
    )
    return decided.select(
        url_col,
        "host",
        "path",
        F.when(F.col("win").isNull(), F.lit(True))
        .otherwise(F.col("win")["al"] == 1)
        .alias("allowed"),
    )


# --- sitemap XML parsing (r15) -------------------------------------------------

#: XML predefined-entity decode order, shared with the SQL oracle:
#: '&amp;' LAST so a double-escaped '&amp;lt;' decodes ONE level (to
#: the literal '&lt;'), not two
_XML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def _xml_unescape(c: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _xml_child(block: Column, tag: str) -> Column:
    """Trimmed, entity-decoded text content of ``<tag>...</tag>``
    inside a block; NULL when the tag is absent or empty. The
    ''-means-NULL bridge is explicit because Spark's regexp_extract
    returns '' on no match where DuckDB returns NULL (the r13
    url_canonical_dedup trap) — both engines route through the same
    CASE. Tags are matched WITHOUT attributes (sitemap-protocol child
    elements carry none; the attribute-bearing ROOT tags never reach
    this helper). Whitespace stripping uses an EXPLICIT [ \\t\\n\\r]
    class — Spark's trim() strips spaces only, and Java's \\s differs
    from RE2's (the r14 html_* rule), so the explicit class is the
    only form both engines replay identically."""
    raw = F.regexp_replace(
        F.regexp_extract(block, rf"(?s)<{tag}>(.*?)</{tag}>", 1),
        "^[ \t\n\r]+|[ \t\n\r]+$",
        "",
    )
    return F.when(raw == "", F.lit(None)).otherwise(_xml_unescape(raw))


def _sitemap_parsed(
    df: DataFrame, xml_col: str, keep: "list[str]"
) -> DataFrame:
    """Shared parse core: ``keep`` columns + (kind, ord, loc, lastmod,
    changefreq, priority) — one exploded row per ``<url>`` (urlset) or
    ``<sitemap>`` (sitemapindex) child whose required ``<loc>`` is
    present. Rows whose body is neither root kind vanish (explode of
    an empty array). Map-only: regexp_extract_all + posexplode; no
    shuffle, no UDF — the 100 TB cost is one pass over the bodies."""
    body = F.col(xml_col)
    kind = (
        F.when(body.rlike("<sitemapindex[ \t\n\r>]"), F.lit("index"))
        .when(body.rlike("<urlset[ \t\n\r>]"), F.lit("urlset"))
        .otherwise(F.lit(None))
    )
    blocks = (
        F.when(
            F.col("kind") == "index",
            F.regexp_extract_all(body, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
        )
        .when(
            F.col("kind") == "urlset",
            F.regexp_extract_all(body, F.lit(r"(?s)<url>(.*?)</url>"), 1),
        )
        .otherwise(F.array())
    )
    exploded = (
        df.withColumn("kind", kind)
        .withColumn("__blocks", blocks)
        .select(
            *keep,
            "kind",
            F.posexplode("__blocks").alias("__p", "__block"),
        )
    )
    b = F.col("__block")
    return exploded.select(
        *keep,
        "kind",
        (F.col("__p") + F.lit(1)).cast("int").alias("ord"),
        _xml_child(b, "loc").alias("loc"),
        _xml_child(b, "lastmod").alias("lastmod"),
        _xml_child(b, "changefreq").alias("changefreq"),
        _xml_child(b, "priority").cast("double").alias("priority"),
    ).filter(F.col("loc").isNotNull())


def sitemap_entries(
    df: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Parse sitemap-protocol XML bodies into child rows: a ``urlset``
    body yields its ``<url>`` entries, a ``sitemapindex`` yields its
    ``<sitemap>`` entries. Returns (url_col, kind, ord, loc, lastmod,
    changefreq, priority) — ``ord`` is the 1-based position in the
    body, ``kind`` says which grammar produced the row; optional
    fields are NULL when absent, ``priority`` parses as DOUBLE.

    Subset contract (documented, shared with the oracle): child
    elements are matched without attributes or namespace prefixes
    (the protocol defines none), the five predefined XML entities are
    decoded in ``<loc>``-family text (``&amp;`` last — one level),
    CDATA sections are out of scope. Bodies that are neither root
    kind produce no rows."""
    return _sitemap_parsed(df, xml_col, [url_col])


def sitemap_url_entries(
    bodies: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Resolve sitemap discovery to FINAL page-URL entries: direct
    ``urlset`` bodies pass through; ``sitemapindex`` children are
    looked up in ``bodies`` by URL (one equi-join) and their
    ``urlset`` entries returned with the index as ``root_sitemap``.
    Returns (root_sitemap, src_sitemap, loc, lastmod, changefreq,
    priority).

    ONE level of indirection by construction — the sitemaps protocol
    forbids an index file from listing another index file, so a
    child that parses as ``index`` is dropped (no silent recursion),
    and a child URL with no body in ``bodies`` drops out of the inner
    join (not yet fetched — the frontier's job, not the parser's).
    Plan shape: parse is map-only; the resolution is a single
    URL equi-join (index child lists are tiny next to the bodies
    frame — AQE broadcasts the small side); no window, no UDF."""
    e = sitemap_entries(bodies, url_col, xml_col)
    out_cols = [
        "root_sitemap",
        "src_sitemap",
        "loc",
        "lastmod",
        "changefreq",
        "priority",
    ]
    direct = e.filter(F.col("kind") == "urlset").select(
        F.col(url_col).alias("root_sitemap"),
        F.col(url_col).alias("src_sitemap"),
        "loc",
        "lastmod",
        "changefreq",
        "priority",
    )
    children = e.filter(F.col("kind") == "index").select(
        F.col(url_col).alias("root_sitemap"),
        F.col("loc").alias("__child_url"),
    )
    child_bodies = children.join(
        bodies.select(
            F.col(url_col).alias("__child_url"), F.col(xml_col)
        ),
        "__child_url",
    )
    resolved = _sitemap_parsed(
        child_bodies, xml_col, ["root_sitemap", "__child_url"]
    )
    via_index = resolved.filter(F.col("kind") == "urlset").select(
        "root_sitemap",
        F.col("__child_url").alias("src_sitemap"),
        "loc",
        "lastmod",
        "changefreq",
        "priority",
    )
    return direct.select(out_cols).unionByName(via_index.select(out_cols))


# --- HTML link-graph extraction (r15) ------------------------------------------

#: schemes a frontier never fetches — dropped at extraction (shared
#: list, lowercase; checked case-insensitively)
_NONFETCH_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def html_link_graph(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Extract the outbound link edges of HTML pages: one row per
    ``<a href=...>`` anchor — (url_col, dst, anchor, nofollow). The
    web-graph builder between ``html_main_text`` (content) and the
    graph family (pagerank over the crawl graph, in-degree features).

    Shared-with-oracle grammar subset (every rule RE2-safe, explicit
    whitespace classes — Java \\s != RE2 \\s):

    - anchors matched as ``<a`` + whitespace + attrs + ``>`` ...
      ``</a>`` (dotall, non-greedy, case-insensitive);
    - ``href`` value in double OR single quotes (unquoted values are
      out of the subset — vanishingly rare in real markup);
    - dropped: empty hrefs, pure fragments (``#...``), and
      javascript:/mailto:/tel:/data: schemes;
    - resolution against the page URL: absolute kept; ``//host/...``
      gets the page scheme; ``/path`` joins scheme://host;
      anything else joins the page's DIRECTORY (path up to the last
      '/'). Dot-segments are NOT normalized (documented subset —
      canonical_url downstream handles the dedup-relevant forms);
    - ``anchor``: inner markup stripped, entities decoded one level
      (the sitemap _xml_unescape chain), whitespace runs collapsed to
      one space, stripped;
    - ``nofollow``: any ``rel`` attribute value containing the token.

    Map-only: regexp_extract_all + posexplode; no shuffle, no UDF —
    at 100 TB this is one pass over the pages, and the edge volume
    (~50 links/page) is the output's size, not a join blowup."""
    page = F.col(url_col)
    scheme = F.regexp_extract(page, r"^([A-Za-z][A-Za-z0-9+.\-]*)://.*$", 1)
    host = F.regexp_extract(
        page, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*).*$", 1
    )
    path0 = F.regexp_extract(
        page, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*).*$", 1
    )
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    # the page's directory incl. the trailing '/'
    pdir = F.regexp_extract(path, r"^(.*/)[^/]*$", 1)

    blocks = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"(?si)<a[ \t\n\r][^>]*>.*?</a>"),
        0,
    )
    e = df.select(
        page.alias("__src"),
        scheme.alias("__scheme"),
        host.alias("__host"),
        pdir.alias("__pdir"),
        F.posexplode(blocks).alias("__p", "__a"),
    )
    a = F.col("__a")
    href_d = F.regexp_extract(a, "(?si)href[ \t\n\r]*=[ \t\n\r]*\"([^\"]*)\"", 1)
    href_s = F.regexp_extract(a, "(?si)href[ \t\n\r]*=[ \t\n\r]*'([^']*)'", 1)
    href = F.when(href_d != "", href_d).otherwise(href_s)
    href = F.regexp_replace(href, "^[ \t\n\r]+|[ \t\n\r]+$", "")
    low = F.lower(href)
    bad = (href == "") | low.startswith("#")
    for s in _NONFETCH_SCHEMES:
        bad = bad | low.startswith(s)
    dst = (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), href)
        .when(
            href.startswith("//"),
            F.concat(F.col("__scheme"), F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__host"), href
            ),
        )
        .otherwise(
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__host"),
                F.col("__pdir"), href,
            )
        )
    )
    inner = F.regexp_extract(a, r"(?si)<a[ \t\n\r][^>]*>(.*)</a>", 1)
    anchor = F.regexp_replace(inner, "<[^>]*>", "")
    anchor = _xml_unescape(anchor)
    anchor = F.regexp_replace(anchor, "[ \t\n\r]+", " ")
    anchor = F.regexp_replace(anchor, "^ +| +$", "")
    nofollow = a.rlike(
        "(?si)rel[ \t\n\r]*=[ \t\n\r]*['\"][^'\"]*nofollow"
    )
    return (
        e.filter(~bad)
        .select(
            F.col("__src").alias(url_col),
            dst.alias("dst"),
            anchor.alias("anchor"),
            nofollow.alias("nofollow"),
        )
    )


# --- legacy-charset decode fallback (r15) --------------------------------------

#: charsets the COLUMN-expression decode handles exactly; anything else
#: declared routes through the Arrow fallback in decode_legacy_bodies
_NATIVE_CHARSETS = (
    "",
    "utf-8", "utf8", "us-ascii", "ascii",
    "iso-8859-1", "latin-1", "latin1", "iso8859-1", "l1",
    "windows-1252", "cp1252", "x-cp1252",
)


def decode_legacy_bodies(
    df: DataFrame,
    charset_col: str = "charset",
    body_col: str = "body",
    bytes_col: str = "body_bytes",
) -> DataFrame:
    """Upgrade the lenient mojibake fallback for DECLARED legacy
    charsets (Shift_JIS, EUC-JP/KR, GBK, Big5, ...) to a real decode
    through Python's codec registry. The native column path stays the
    fast path: rows whose charset is in ``_NATIVE_CHARSETS`` pass
    through UNTOUCHED (bit-identical to :func:`_decode_body`); only
    the declared-legacy tail — a small fraction of any real crawl —
    routes through one Arrow-batched ``mapInPandas``. An unknown
    charset label (LookupError) keeps the lenient column result;
    undecodable byte sequences use errors='replace' (a crawler never
    raises on content).

    Plan shape: a charset predicate SPLIT + union — the legacy leg's
    Python cost is proportional to the legacy subset only, not the
    corpus; no shuffle is added (both legs stay map-only).

    The input is PERSISTED before the split (r15 optimization, the
    CLAUDE.md inlining gotcha): without the cache boundary Catalyst
    inlines the upstream parse expressions (for the usual caller, the
    warc_extract_binary grammar — big enough that whole-stage codegen
    fails janino compile and the stage runs interpreted) into BOTH
    legs' filters AND projections, so the parse ran ~4x per row;
    filtering the materialized columns runs it once (measured 3.9 s ->
    ~0.9 s on the legacy-charset golden at sf0.1, janino failure gone). Generation-evicted
    per call site (functions/_cache) like every library persist."""
    import pandas as pd  # noqa: F401

    from ._cache import pin_latest

    # batch-only persist (ADVICE r15): a streaming frame would raise
    # AnalysisException on persist — streaming callers keep the
    # stateless split (the parse runs per leg there, the price of a
    # mutable input; same guard as crawl_ingest_report)
    if not df.isStreaming:
        df = df.persist()
        pin_latest("crawl.decode_legacy_bodies", df)
    native = F.lower(F.col(charset_col)).isin(*_NATIVE_CHARSETS)
    nat = df.filter(native)
    leg = df.filter(~native)

    schema = leg.schema

    def _dec(batches):
        import codecs

        for pdf in batches:
            out = []
            for cs, bb, fallback in zip(
                pdf[charset_col], pdf[bytes_col], pdf[body_col]
            ):
                try:
                    codecs.lookup(str(cs))
                except LookupError:
                    out.append(fallback)
                    continue
                out.append(bytes(bb).decode(str(cs), errors="replace"))
            yield pdf.assign(**{body_col: out})

    return nat.unionByName(leg.mapInPandas(_dec, schema))
