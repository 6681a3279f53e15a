"""Dependency-free GIF codec (r15): after WebP (functions/webp.py),
GIF was the next web image class silently exiting near-dup with a NULL
phash — same argument as the r13 progressive-JPEG and r15 WebP items.

Decoder scope (GIF87a/GIF89a): logical screen descriptor, global and
local color tables, variable-width LSB-first LZW with clear/EOI codes,
dictionary growth to 12 bits with deferred-clear tolerance, interlaced
row ordering, and extension-block skipping. Animated GIFs decode their
FIRST frame (the standard fingerprint choice for near-dup — the first
frame is what a thumbnailer shows); transparency is ignored (the
phash contract wants (h, w, 3) RGB and the transparent index still
maps to a palette color). Truncated streams and missing color tables
raise ``NotImplementedError`` — the loud-refusal convention.

The encoder exists to make the decoder testable without a codec
library (the encode_png / encode_webp_vp8l pattern): real LZW (not
clear-code spam), optional interlace, local-vs-global color table
choice, <= 256 distinct colors required (raises otherwise — this
engine quantizes nothing silently).
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def _interlace_rows(h: int) -> "List[int]":
    rows: List[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


# --- LZW ------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: List[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(1 << min_code))
        table.append(b"")  # clear
        table.append(b"")  # eoi
        return min_code + 1

    width = reset()
    acc = n = 0
    prev: "bytes | None" = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise NotImplementedError("GIF LZW first code invalid")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise NotImplementedError("GIF LZW code out of range")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_expected:
                return bytes(out)
    if len(out) < n_expected:
        raise NotImplementedError("GIF LZW stream truncated")
    return bytes(out)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    bits: List[Tuple[int, int]] = []  # (code, width)

    def reset() -> "Tuple[Dict[bytes, int], int, int]":
        return (
            {bytes([i]): i for i in range(1 << min_code)},
            clear + 2,
            min_code + 1,
        )

    table, nxt, width = reset()
    bits.append((clear, width))
    w = b""
    for b in indices:
        k = bytes([b])
        if w + k in table:
            w += k
            continue
        bits.append((table[w], width))
        if nxt < 4096:
            table[w + k] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                # mirror the decoder: it grows after DEFINING code
                # 2^width - 1, i.e. one step behind the encoder's add
                width += 1
        else:
            bits.append((clear, width))
            table, nxt, width = reset()
        w = k
    if w:
        bits.append((table[w], width))
    bits.append((eoi, width))
    out = bytearray()
    acc = n = 0
    for code, wd in bits:
        acc |= code << n
        n += wd
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# --- decoder --------------------------------------------------------------------


def gif_pixels(payload: bytes):
    """Decode the FIRST frame of a GIF to (h, w, 3) uint8 RGB."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    flags = payload[10]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[off : off + 3 * n]
        off += 3 * n

    while off < len(payload):
        b = payload[off]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            off += 2
            while off < len(payload) and payload[off]:
                off += payload[off] + 1
            off += 1
            continue
        if b != 0x2C:
            raise NotImplementedError(f"GIF unknown block 0x{b:02x}")
        # image descriptor
        iw = int.from_bytes(payload[off + 5 : off + 7], "little")
        ih = int.from_bytes(payload[off + 7 : off + 9], "little")
        iflags = payload[off + 9]
        off += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = payload[off : off + 3 * n]
            off += 3 * n
        if ct is None:
            raise NotImplementedError("GIF image without a color table")
        min_code = payload[off]
        off += 1
        data = bytearray()
        while off < len(payload) and payload[off]:
            ln = payload[off]
            data += payload[off + 1 : off + 1 + ln]
            off += ln + 1
        off += 1
        idx = _lzw_decode(bytes(data), min_code, iw * ih)
        arr = np.frombuffer(idx[: iw * ih], dtype=np.uint8)
        if arr.max(initial=0) * 3 + 2 >= len(ct):
            raise NotImplementedError("GIF palette index overflow")
        pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[arr].reshape(ih, iw, 3)
        if iflags & 0x40:  # interlaced: rows arrive in pass order
            out = np.empty_like(rgb)
            out[_interlace_rows(ih)] = rgb
            rgb = out
        return rgb.copy()
    raise NotImplementedError("GIF stream has no image descriptor")


# --- encoder --------------------------------------------------------------------


def encode_gif(pixels, interlace: bool = False, local_table: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (<= 256 distinct colors —
    raises otherwise; nothing quantizes silently) as a single-frame
    GIF89a, with real LZW and optional interlacing / local-color-table
    placement so the decoder's branches are all reachable in tests."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    size_field = 0
    while (2 << size_field) < max(len(colors), 2):
        size_field += 1
    n_pal = 2 << size_field
    pal = bytearray()
    for c in colors:
        pal += bytes(int(v) for v in c)
    pal += b"\x00" * (3 * n_pal - len(pal))

    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_rows(h)]
    min_code = max(2, size_field + 1)
    lzw = _lzw_encode(idx.reshape(-1).tobytes(), min_code)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_table:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | size_field, 0, 0])
        out += pal
    out += b"\x2c" + b"\x00" * 4  # image at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    iflags = (0x40 if interlace else 0) | (0x80 | size_field if local_table else 0)
    out += bytes([iflags])
    if local_table:
        out += pal
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
