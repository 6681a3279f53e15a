"""Dependency-free PDF text extraction (r15): the dominant non-HTML
document format in a real crawl — a WARC response with
``application/pdf`` currently contributes nothing to the documents
table, the same silent-exit argument that brought JPEG/WebP/GIF into
the image path.

Scope — the classic-PDF subset a text extractor needs, loud refusals
beyond it (the arithmetic-JPEG convention; every refusal pinned by a
test):

- classic cross-reference TABLES with ``/Prev`` chains (incremental
  updates); an xref STREAM at ``startxref`` (PDF 1.5+) raises;
- object grammar: dicts, arrays, names, numbers, booleans/null,
  literal strings with nesting/escapes/octal, hex strings, indirect
  references (``N G R``, resolved lazily incl. indirect ``/Length``),
  streams (raw bytes after the dict);
- ``/Encrypt`` in the trailer raises (encrypted documents);
- page tree walk ``/Root -> /Pages -> /Kids`` (nested), per-page
  ``/Contents`` as one stream or an array (concatenated in order);
- stream filters: none or ``/FlateDecode`` (zlib); any other content
  filter raises;
- text operators: ``BT``/``ET`` blocks, ``Tj``, ``'``, ``\"``,
  ``TJ`` (string elements concatenated; kerning offsets do NOT
  synthesize spaces — documented), line breaks from ``T*``, ``TD``,
  and ``Td`` with a negative y displacement; everything else
  (positioning, color, images, fonts) is skipped. String bytes decode
  as cp1252-with-latin1-fallback — the WinAnsiEncoding superset this
  writer emits; CID/Type0 composite fonts are out of the subset (their
  2-byte strings would come out garbled, which the extractor cannot
  detect without font tables — callers route known-CID corpora away).

The encoder exists to make the parser testable without a PDF library
(the encode_png / encode_jpeg / encode_webp_vp8l pattern): legal
classic-xref PDFs with Flate-compressed content streams, multi-page
trees, TJ arrays, every string-escape form, and an incremental-update
mode that exercises the ``/Prev`` chain.

Caveat recorded for honesty: written against the public PDF 1.7 spec
(ISO 32000-1); no reference parser exists in this container, so
byte-level interop is pinned by round-trip + structural tests, not by
parsing a foreign file.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: "Dict[str, Any]", raw: bytes):
        self.d = d
        self.raw = raw


class _Lexer:
    """Token reader over the raw bytes (objects and content streams
    share the grammar for everything an extractor needs)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.b = data
        self.i = pos

    def _skip_ws(self) -> None:
        b, i, n = self.b, self.i, len(self.b)
        while i < n:
            c = b[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # '%' comment to EOL
                while i < n and b[i] not in (0x0A, 0x0D):
                    i += 1
            else:
                break
        self.i = i

    def peek_bytes(self, k: int) -> bytes:
        self._skip_ws()
        return self.b[self.i : self.i + k]

    def read_token(self) -> Optional[Any]:
        """One object-level token: dict/array/name/number/string/hex/
        bool/null/_Ref handled by the caller via read_object; this
        returns raw operator words for content streams."""
        self._skip_ws()
        b, i, n = self.b, self.i, len(self.b)
        if i >= n:
            return None
        c = b[i]
        if c == 0x28:  # ( literal string
            return self._string()
        if c == 0x3C:  # < or <<
            if b[i : i + 2] == b"<<":
                self.i += 2
                return "<<"
            return self._hex_string()
        if c == 0x3E and b[i : i + 2] == b">>":
            self.i += 2
            return ">>"
        if c == 0x5B:
            self.i += 1
            return "["
        if c == 0x5D:
            self.i += 1
            return "]"
        if c == 0x2F:  # /Name
            j = i + 1
            while j < n and b[j] not in _WS and b[j] not in _DELIM:
                j += 1
            raw = b[i + 1 : j]
            self.i = j
            # #xx hex escapes in names
            name = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                raw,
            )
            return ("name", name.decode("latin-1"))
        # number / keyword / operator word
        j = i
        while j < n and b[j] not in _WS and b[j] not in _DELIM:
            j += 1
        word = b[i:j]
        self.i = j if j > i else i + 1
        return ("word", word.decode("latin-1"))

    def _string(self) -> Tuple[str, bytes]:
        b, n = self.b, len(self.b)
        i = self.i + 1
        depth = 1
        out = bytearray()
        while i < n and depth:
            c = b[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= n:
                    break
                e = b[i]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\x0c",
                    }[e]
                    i += 1
                elif e in b"()\\":
                    out.append(e)
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while i < n and len(oct_digits) < 3 and 0x30 <= b[i] <= 0x37:
                        oct_digits.append(b[i])
                        i += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if e == 0x0D and i < n and b[i] == 0x0A:
                        i += 1
                else:
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.i = i
        return ("str", bytes(out))

    def _hex_string(self) -> Tuple[str, bytes]:
        b = self.b
        j = b.index(b">", self.i)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", b[self.i + 1 : j])
        if len(hx) % 2:
            hx += b"0"
        self.i = j + 1
        return ("str", bytes.fromhex(hx.decode()))


def _parse_object(lx: _Lexer) -> Any:
    """One PDF object (recursive); 'N G R' lookahead folds into _Ref."""
    t = lx.read_token()
    if t is None:
        raise NotImplementedError("PDF: unexpected end of data")
    if t == "<<":
        d: Dict[str, Any] = {}
        while True:
            k = lx.read_token()
            if k == ">>":
                return d
            if not (isinstance(k, tuple) and k[0] == "name"):
                raise NotImplementedError("PDF: malformed dictionary key")
            d[k[1]] = _parse_object(lx)
    if t == "[":
        arr: List[Any] = []
        while True:
            save = lx.i
            nxt = lx.read_token()
            if nxt == "]":
                return arr
            lx.i = save
            arr.append(_parse_object(lx))
    if isinstance(t, tuple):
        kind, v = t
        if kind == "str":
            return ("str", v)
        if kind == "name":
            return ("name", v)
        # word: number / keyword / possible "N G R"
        if re.fullmatch(r"[+-]?[0-9]+", v):
            save = lx.i
            t2 = lx.read_token()
            if isinstance(t2, tuple) and t2[0] == "word" and re.fullmatch(r"[0-9]+", t2[1]):
                t3 = lx.read_token()
                if isinstance(t3, tuple) and t3 == ("word", "R"):
                    return _Ref(int(v), int(t2[1]))
            lx.i = save
            return int(v)
        if re.fullmatch(r"[+-]?[0-9]*\.[0-9]*", v):
            return float(v)
        if v == "true":
            return True
        if v == "false":
            return False
        if v == "null":
            return None
        return ("word", v)
    raise NotImplementedError(f"PDF: unexpected token {t!r}")


class _Doc:
    def __init__(self, data: bytes):
        self.b = data
        self.xref: Dict[int, int] = {}
        self.trailer: Dict[str, Any] = {}
        self._cache: Dict[int, Any] = {}
        self._load_xref()

    # -- cross-reference ---------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.b[-2048:]
        m = None
        for m in re.finditer(rb"startxref[\r\n ]+([0-9]+)", tail):
            pass
        if m is None:
            raise NotImplementedError("PDF: no startxref")
        off = int(m.group(1))
        seen = set()
        while True:
            if off in seen:
                break  # cyclic /Prev: stop loudly-enough (entries loaded)
            seen.add(off)
            lx = _Lexer(self.b, off)
            if lx.peek_bytes(4) != b"xref":
                raise NotImplementedError(
                    "PDF: cross-reference stream (PDF 1.5+ xref streams "
                    "are out of the classic-table subset)"
                )
            lx.i += 4
            while True:
                save = lx.i
                t = lx.read_token()
                if t == ("word", "trailer"):
                    break
                if not (isinstance(t, tuple) and t[0] == "word"):
                    raise NotImplementedError("PDF: malformed xref section")
                start = int(t[1])
                cnt_t = lx.read_token()
                count = int(cnt_t[1])
                lx._skip_ws()
                for k in range(count):
                    ent = self.b[lx.i : lx.i + 20]
                    eo = int(ent[0:10])
                    typ = ent[17:18]
                    num = start + k
                    if typ == b"n" and num not in self.xref:
                        self.xref[num] = eo
                    lx.i += 20
                del save
            tr = _parse_object(lx)
            for k, v in tr.items():
                self.trailer.setdefault(k, v)
            if "Encrypt" in self.trailer:
                raise NotImplementedError("PDF: encrypted document")
            prev = tr.get("Prev")
            if prev is None:
                break
            off = int(prev)

    # -- objects -----------------------------------------------------------

    def resolve(self, v: Any) -> Any:
        while isinstance(v, _Ref):
            v = self._object(v.num)
        return v

    def _object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num)
        if off is None:
            return None
        lx = _Lexer(self.b, off)
        lx.read_token()  # obj number
        lx.read_token()  # generation
        kw = lx.read_token()
        if kw != ("word", "obj"):
            raise NotImplementedError("PDF: malformed object header")
        obj = _parse_object(lx)
        save = lx.i
        nxt = lx.read_token()
        if nxt == ("word", "stream"):
            # raw bytes start after the EOL following 'stream'
            i = lx.i
            if self.b[i : i + 2] == b"\r\n":
                i += 2
            elif self.b[i : i + 1] in (b"\n", b"\r"):
                i += 1
            length = self.resolve(obj.get("Length"))
            raw = self.b[i : i + int(length)]
            obj = _Stream(obj, raw)
        else:
            lx.i = save
        self._cache[num] = obj
        return obj

    def stream_data(self, s: _Stream) -> bytes:
        filt = self.resolve(s.d.get("Filter"))
        if filt is None:
            return s.raw
        filters = filt if isinstance(filt, list) else [filt]
        data = s.raw
        for f in filters:
            f = self.resolve(f)
            name = f[1] if isinstance(f, tuple) else f
            if name == "FlateDecode":
                data = zlib.decompress(data)
            else:
                raise NotImplementedError(f"PDF: stream filter {name}")
        return data

    # -- page tree ---------------------------------------------------------

    def pages(self) -> "List[Dict[str, Any]]":
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise NotImplementedError("PDF: missing document catalog")
        out: List[Dict[str, Any]] = []

        def walk(node_ref: Any) -> None:
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            typ = node.get("Type")
            tname = typ[1] if isinstance(typ, tuple) else typ
            if tname == "Page":
                out.append(node)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        walk(root.get("Pages"))
        return out


def _decode_pdf_text(raw: bytes) -> str:
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _extract_content_text(data: bytes) -> "List[str]":
    """Text runs from one content stream, with '\\n' markers emitted at
    line-break operators (T*, TD, negative-y Td) inside BT/ET."""
    lx = _Lexer(data)
    out: List[str] = []
    stack: List[Any] = []
    in_text = False
    while True:
        save = lx.i
        t = lx.read_token()
        if t is None:
            break
        if t in ("<<", "[", "]", ">>"):
            if t == "<<" or t == "[":
                lx.i = save
                stack.append(_parse_object(lx))
            continue
        if isinstance(t, tuple):
            kind, v = t
            if kind == "word":
                if re.fullmatch(r"[+-]?[0-9]+", v):
                    stack.append(int(v))
                    continue
                if re.fullmatch(r"[+-]?[0-9]*\.[0-9]+", v) or re.fullmatch(
                    r"[+-]?[0-9]+\.[0-9]*", v
                ):
                    stack.append(float(v))
                    continue
                if v == "BT":
                    in_text = True
                elif v == "ET":
                    in_text = False
                elif in_text and v == "Tj":
                    if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "str":
                        out.append(_decode_pdf_text(stack[-1][1]))
                elif in_text and v in ("'", '"'):
                    # both move to the next line first
                    out.append("\n")
                    for item in reversed(stack[-3:]):
                        if isinstance(item, tuple) and item[0] == "str":
                            out.append(_decode_pdf_text(item[1]))
                            break
                elif in_text and v == "TJ":
                    if stack and isinstance(stack[-1], list):
                        for item in stack[-1]:
                            if isinstance(item, tuple) and item[0] == "str":
                                out.append(_decode_pdf_text(item[1]))
                elif in_text and v == "T*":
                    out.append("\n")
                elif in_text and v == "TD":
                    out.append("\n")
                    stack and stack.pop()
                elif in_text and v == "Td":
                    if (
                        len(stack) >= 1
                        and isinstance(stack[-1], (int, float))
                        and stack[-1] < 0
                    ):
                        out.append("\n")
                stack.append(("op", v))
                if len(stack) > 64:
                    del stack[:-8]
            else:
                stack.append(t)
        else:
            stack.append(t)
    return out


def pdf_text(payload: bytes) -> str:
    """Extract the text of a classic-xref PDF (see module docstring for
    the subset + refusal contract). Line breaks come from the text
    operators; runs on one line concatenate without synthesized
    spaces."""
    if not payload.startswith(b"%PDF-"):
        raise NotImplementedError("not a PDF payload")
    doc = _Doc(payload)
    parts: List[str] = []
    for page in doc.pages():
        contents = doc.resolve(page.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        data = b""
        for s in streams:
            s = doc.resolve(s)
            if isinstance(s, _Stream):
                data += doc.stream_data(s) + b"\n"
        page_runs = _extract_content_text(data)
        text = "".join(page_runs)
        # collapse the operator-emitted newlines' duplicates and edges
        text = re.sub(r"\n+", "\n", text).strip("\n")
        if text:
            parts.append(text)
    return "\n".join(parts)


# --- writer (the testability twin) ---------------------------------------------


def _pdf_escape(s: str) -> bytes:
    raw = s.encode("cp1252", errors="replace")
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def encode_pdf(
    pages: "List[List[str]]",
    compress: bool = True,
    use_tj_arrays: bool = False,
    incremental_noop: bool = False,
) -> bytes:
    """Write a legal classic-xref PDF: one entry of ``pages`` per page,
    each a list of text lines (first line via ``Td``+``Tj``, the rest
    via ``T*``). ``use_tj_arrays`` emits every other line as a kerned
    ``TJ`` array split mid-line; ``incremental_noop`` appends an
    incremental update section whose trailer ``/Prev``-chains to the
    first xref (same objects — exercises the chain walk)."""
    objs: List[bytes] = []

    def obj(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n_pages = len(pages)
    # object numbers are deterministic: 1 catalog, 2 pages, then per
    # page (page, content), last font
    font_num = 2 + 2 * n_pages + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    obj(b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        obj(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td ")
        for k, line in enumerate(lines):
            if k > 0:
                ops += b"T* "
            if use_tj_arrays and k % 2 == 1 and len(line) > 3:
                mid = len(line) // 2
                ops += (
                    b"[("
                    + _pdf_escape(line[:mid])
                    + b") -250 ("
                    + _pdf_escape(line[mid:])
                    + b")] TJ "
                )
            else:
                ops += b"(" + _pdf_escape(line) + b") Tj "
        ops += b"ET"
        data = bytes(ops)
        if compress:
            z = zlib.compress(data)
            stream_obj = (
                f"<< /Length {len(z)} /Filter /FlateDecode >>\nstream\n".encode()
                + z
                + b"\nendstream"
            )
        else:
            stream_obj = (
                f"<< /Length {len(data)} >>\nstream\n".encode()
                + data
                + b"\nendstream"
            )
        obj(stream_obj)
    obj(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    n = len(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()

    if incremental_noop:
        # empty update section: a fresh xref with zero entries whose
        # trailer chains back — the /Prev walk must fall through to the
        # original entries
        xref2 = len(out)
        out += (
            f"xref\n0 1\n0000000000 65535 f \n"
            f"trailer\n<< /Size {n} /Root 1 0 R /Prev {xref_off} >>\n"
            f"startxref\n{xref2}\n%%EOF\n"
        ).encode()
    return bytes(out)


# --- Spark operator -------------------------------------------------------------


def pdf_text_extract(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """(id, text, error) for a BINARY PDF-payload frame: one
    Arrow-batched ``mapInPandas`` over :func:`pdf_text` (the multimodal
    ``real_decode`` pattern). ``error`` carries the refusal reason for
    out-of-subset documents (encrypted, xref-stream, exotic filters,
    non-PDF bytes) with NULL text — a crawl pipeline keeps refusal
    RATES visible instead of silently dropping the rows. Per-file
    parallelism; no shuffle; executor memory holds one document's
    bytes at a time."""

    def _run(batches):
        import pandas as pd

        for b in batches:
            ids, texts, errs = [], [], []
            for i, pl in zip(b[id_col], b[payload_col]):
                ids.append(i)
                try:
                    texts.append(pdf_text(bytes(pl)))
                    errs.append(None)
                except NotImplementedError as e:
                    texts.append(None)
                    errs.append(str(e))
            yield pd.DataFrame({id_col: ids, "text": texts, "error": errs})

    return df.mapInPandas(_run, f"{id_col} long, text string, error string")
