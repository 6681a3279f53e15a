"""Multimodal decode: real (dependency-free) container-header parsing
for BMP/PNG/WAV through the Arrow mapInPandas plumbing, plus the
NotImplementedError contract for compressed codecs.

Reference anchor: the reference stores opaque binary treasures
(/root/reference/proto/hydraide.proto Treasure bytes values); media
decoding is a beyond-parity capability of the training-data pipeline.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import Row

from hydraide_spark.functions.multimodal import (
    decode_media_meta,
    extract_features,
    real_decode,
)


def make_bmp(width: int, height: int) -> bytes:
    """Minimal but structurally valid 24-bit BMP (BITMAPINFOHEADER)."""
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    pixel_bytes = row_bytes * abs(height)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + b"\x00" * pixel_bytes


def make_png(width: int, height: int) -> bytes:
    """Valid PNG signature + IHDR chunk (CRC included), no image data."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def make_wav(sample_rate: int, channels: int, bits: int, n_frames: int) -> bytes:
    """Canonical RIFF/WAVE: fmt chunk + data chunk of n_frames samples."""
    data = b"\x00" * (n_frames * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * channels * (bits // 8),
        channels * (bits // 8),
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_decode_bmp_png_wav_headers():
    assert real_decode(make_bmp(17, 9), "image") == {
        "format": "bmp", "width": 17, "height": 9,
        "sample_rate": None, "duration_ms": None,
    }
    # top-down BMP stores a negative height; magnitude is pixel height
    assert real_decode(make_bmp(4, -6), "image")["height"] == 6
    assert real_decode(make_png(640, 480), "image") == {
        "format": "png", "width": 640, "height": 480,
        "sample_rate": None, "duration_ms": None,
    }
    # 8000 Hz mono 16-bit, 4000 frames -> exactly 500 ms
    wav = real_decode(make_wav(8000, 1, 16, 4000), "audio")
    assert wav == {
        "format": "wav", "width": None, "height": None,
        "sample_rate": 8000, "duration_ms": 500,
    }


def test_real_decode_wav_odd_chunk_alignment():
    """RIFF chunks are word-aligned: an odd-sized leading chunk must not
    desync the walk that finds fmt/data."""
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 2 * 2, 4, 16)
    data = b"\x00" * (44100 * 2 * 2)  # exactly 1 s stereo 16-bit
    body = b"WAVE"
    body += b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = real_decode(payload, "audio")
    assert meta["sample_rate"] == 44100 and meta["duration_ms"] == 1000


def test_real_decode_compressed_codec_raises():
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 64, "image")  # JPEG SOI
    with pytest.raises(NotImplementedError):
        real_decode(b"", "image")


def test_decode_media_meta_through_mapinpandas(spark):
    """End-to-end: generated files as binary payloads in a DataFrame,
    decoded distributed via Arrow batches."""
    rows = [
        Row(media_id=1, kind="image", payload=bytearray(make_bmp(32, 8)), meta=None),
        Row(media_id=2, kind="image", payload=bytearray(make_png(100, 50)), meta=None),
        Row(media_id=3, kind="audio", payload=bytearray(make_wav(16000, 2, 16, 16000)), meta=None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<format:string,width:int,height:int,sample_rate:int,duration_ms:bigint>",
    ).repartition(3)
    got = {r["media_id"]: r.asDict() for r in decode_media_meta(df).collect()}
    assert got[1]["format"] == "bmp" and (got[1]["width"], got[1]["height"]) == (32, 8)
    assert got[2]["format"] == "png" and (got[2]["width"], got[2]["height"]) == (100, 50)
    assert got[3]["format"] == "wav" and got[3]["sample_rate"] == 16000
    assert got[3]["duration_ms"] == 1000  # 16000 frames at 16 kHz


def test_extract_features_fake_path_still_deterministic(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytearray(b"abc"), meta=None)],
        "media_id long, kind string, payload binary, "
        "meta struct<format:string,width:int,height:int,sample_rate:int,duration_ms:bigint>",
    )
    r = extract_features(df, fake=True).collect()[0]
    assert (r["n_bytes"], r["first_byte"], r["checksum"]) == (3, 97, (97 + 98 + 99) % 997)


def make_jpeg(width, height, progressive=False, extra_segments=True):
    """Minimal JPEG: SOI + optional APP0/DQT filler + SOFn + EOI."""
    out = b"\xff\xd8"
    if extra_segments:
        app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        dqt = bytes(65)  # precision/id byte + 64 quant entries
        out += b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
        out += b"\xff\x01"  # standalone TEM marker must not desync
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += marker + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    return out + b"\xff\xd9"


def test_real_decode_jpeg_sof_header():
    """JPEG SOF walk: baseline and progressive frames, dimensions past
    255 (uint16-BE fields), marker filler and standalone markers
    skipped; DHT-class markers (C4) never mistaken for SOF."""
    assert real_decode(make_jpeg(640, 480), "image") == {
        "format": "jpeg", "width": 640, "height": 480,
        "sample_rate": None, "duration_ms": None,
    }
    assert real_decode(make_jpeg(31, 1031, progressive=True), "image") == {
        "format": "jpeg", "width": 31, "height": 1031,
        "sample_rate": None, "duration_ms": None,
    }
    # a DHT (C4) segment before SOF must be walked over, not parsed
    dht = b"\xff\xc4" + struct.pack(">H", 5) + bytes(3)
    j = make_jpeg(12, 34, extra_segments=False)
    with_dht = j[:2] + dht + j[2:]
    got = real_decode(with_dht, "image")
    assert (got["width"], got["height"]) == (12, 34)
    # SOS before any SOF (corrupt stream) -> no silent garbage
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff\xda\x00\x04\x00\x00", "image")


def make_mp4(width, height, timescale, duration, v1=False, big_box=False):
    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    if v1:
        mvhd_body = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + bytes(80)
    else:
        mvhd_body = bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration) + bytes(80)
    mvhd = box(b"mvhd", mvhd_body)
    tkhd = box(
        b"tkhd",
        bytes(4 + 20 + 8 + 8 + 36) + struct.pack(">II", width << 16, height << 16),
    )
    moov_body = mvhd + box(b"trak", tkhd)
    if big_box:
        # size==1: 64-bit extended size field
        moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_body)) + moov_body
    else:
        moov = box(b"moov", moov_body)
    return ftyp + moov


def test_real_decode_mp4_box_walk():
    """ISO-BMFF: mvhd version 0 AND 1 layouts, 16.16 fixed tkhd dims,
    and a 64-bit extended-size moov box must all parse; a stream
    without moov raises instead of returning garbage."""
    got = real_decode(make_mp4(1920, 1080, 600, 3000), "video")
    assert got == {
        "format": "mp4", "width": 1920, "height": 1080,
        "sample_rate": None, "duration_ms": 5000,
    }
    v1 = real_decode(make_mp4(320, 240, 90000, 90000 * 7, v1=True), "video")
    assert (v1["width"], v1["height"], v1["duration_ms"]) == (320, 240, 7000)
    ext = real_decode(make_mp4(64, 48, 1000, 1500, big_box=True), "video")
    assert (ext["width"], ext["height"], ext["duration_ms"]) == (64, 48, 1500)
    with pytest.raises(NotImplementedError):
        real_decode(struct.pack(">I", 16) + b"ftypisom" + bytes(4), "video")


def test_bmp_roundtrip_and_hashes(spark):
    """encode_bmp <-> bmp_pixels round-trip exactly; dHash is invariant
    to a one-pixel high-bit perturbation within the hamming-3 budget
    while distinct noise images are far apart; aHash decodes too;
    non-BMP payloads yield NULL phash (strict=False) or raise."""
    import numpy as np
    import pytest as _pytest

    from hydraide_spark.functions.multimodal import (
        ahash64_py,
        bmp_pixels,
        dhash64_py,
        encode_bmp,
        image_hashes,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert np.array_equal(bmp_pixels(encode_bmp(px)), px)
    # odd width exercises the stride padding
    px2 = rng.randint(0, 256, size=(17, 13, 3)).astype(np.uint8)
    assert np.array_equal(bmp_pixels(encode_bmp(px2)), px2)

    twin = px.copy()
    twin[16, 16, 0] ^= 128
    d = dhash64_py(px) ^ dhash64_py(twin)
    assert bin(d & (2**64 - 1)).count("1") <= 3
    other = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    far = dhash64_py(px) ^ dhash64_py(other)
    assert bin(far & (2**64 - 1)).count("1") >= 10
    assert isinstance(ahash64_py(px), int)

    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(px))), (2, "image", bytearray(b"\x89PNG1234"))],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r["phash"] for r in image_hashes(media).collect()}
    assert rows[1] == dhash64_py(px)
    assert rows[2] is None
    with _pytest.raises(Exception):
        image_hashes(media, strict=True).collect()


def test_image_neardup_blocked_join_shape(spark):
    """The image near-dup candidate join is the chunk-equality
    equi-join — no cross join in the plan (the repo invariant)."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        encode_bmp,
        image_neardup_pairs,
    )
    from hydraide_spark.plans.inspect import physical_plan

    rng = np.random.RandomState(3)
    rows = []
    for i in range(20):
        px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(px))))
        if i % 5 == 0:
            tw = px.copy()
            tw[8, 8, 0] ^= 128
            rows.append((i + 1000, "image", bytearray(encode_bmp(tw))))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    pairs = image_neardup_pairs(media, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 1000) for i in range(0, 20, 5)}
    assert "CartesianProduct" not in physical_plan(pairs)


def test_png_pixel_roundtrip_all_filters():
    """png_pixels is a REAL decode: zlib inflate + all five spec
    unfilters reproduce the source pixels exactly, for every filter
    type and for odd (non-multiple-of-4) widths."""
    import numpy as np

    from hydraide_spark.functions.multimodal import encode_png, png_pixels

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(21, 19, 3)).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (png_pixels(encode_png(px, filters=filters)) == px).all()
    # RGBA decodes and drops alpha
    pxa = rng.randint(0, 256, size=(8, 8, 4)).astype(np.uint8)
    assert (png_pixels(encode_png(pxa, filters=[4])) == pxa[:, :, :3]).all()


def test_png_unsupported_layouts_raise():
    import numpy as np
    import pytest as _pytest

    from hydraide_spark.functions.multimodal import encode_png, png_pixels

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = bytearray(encode_png(px))
    # flip IHDR color type to palette (3) — decoder must refuse loudly,
    # never return garbage pixels
    enc[8 + 8 + 9] = 3
    with _pytest.raises(NotImplementedError):
        png_pixels(bytes(enc))
    with _pytest.raises(NotImplementedError):
        png_pixels(b"\x89PNG\r\n\x1a\nnot-a-chunk")


def test_bmp_and_png_same_pixels_same_hash():
    """Container-independence: the perceptual hash is a function of
    PIXELS — the same image through the BMP and PNG codecs yields the
    identical 64-bit signature."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        dhash64_py,
        encode_bmp,
        encode_png,
        image_pixels,
    )

    px = np.random.RandomState(11).randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    h_bmp = dhash64_py(image_pixels(encode_bmp(px)))
    h_png = dhash64_py(image_pixels(encode_png(px, filters=[2, 3])))
    assert h_bmp == h_png


def test_image_neardup_mixed_containers(spark):
    """A twin stored as PNG must pair with its BMP original — the
    near-dup path is container-agnostic through image_pixels."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        encode_bmp,
        encode_png,
        image_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    rows = []
    for i in range(12):
        px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(px))))
        if i % 4 == 0:
            tw = px.copy()
            tw[8, 8, 0] ^= 128
            rows.append((i + 1000, "image", bytearray(encode_png(tw, filters=[1, 4]))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    pairs = image_neardup_pairs(media, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 1000) for i in range(0, 12, 4)}


def test_wav_roundtrip_and_mixdown():
    import numpy as np

    from hydraide_spark.functions.multimodal import encode_wav, wav_samples

    x = np.random.RandomState(2).normal(0, 0.2, 4000)
    dec, sr = wav_samples(encode_wav(x, 16000))
    assert sr == 16000 and dec.size == 4000
    assert np.abs(dec - np.clip(np.round(x * 32768) / 32768, -1, 1)).max() < 1e-9
    # stereo payload mixes down to the same mono signal
    dec2, _ = wav_samples(encode_wav(x[:256], 8000, channels=2))
    assert np.abs(dec2 - np.clip(np.round(x[:256] * 32768) / 32768, -1, 1)).max() < 1e-9


def test_audio_fingerprint_margins():
    """Twin (tiny additive noise) stays within a few bits; unrelated
    noise sits tens of bits away; amplitude scaling changes nothing."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        audio_fingerprint64_py,
        encode_wav,
        wav_samples,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    x = np.random.RandomState(1).normal(0, 0.2, 8000)
    h0 = audio_fingerprint64_py(wav_samples(encode_wav(x, 16000))[0])
    twin = x + np.random.RandomState(7).normal(0, 5e-4, 8000)
    h1 = audio_fingerprint64_py(wav_samples(encode_wav(twin, 16000))[0])
    other = np.random.RandomState(99).normal(0, 0.2, 8000)
    h2 = audio_fingerprint64_py(wav_samples(encode_wav(other, 16000))[0])
    assert ham(h0, h1) <= 3
    assert ham(h0, h2) >= 10
    assert ham(h0, audio_fingerprint64_py(wav_samples(encode_wav(x, 16000))[0] * 0.25)) == 0


def test_audio_refuses_non_pcm():
    import pytest as _pytest

    from hydraide_spark.functions.multimodal import encode_wav, wav_samples

    enc = bytearray(encode_wav([0.0] * 64, 8000))
    enc[20] = 3  # fmt code -> IEEE float (not PCM)
    with _pytest.raises(NotImplementedError):
        wav_samples(bytes(enc))
    with _pytest.raises(NotImplementedError):
        wav_samples(b"RIFFxxxxWAVE")


def test_audio_neardup_pairs_planted(spark):
    import numpy as np

    from hydraide_spark.functions.multimodal import audio_neardup_pairs, encode_wav

    rows = []
    for i in range(10):
        x = np.random.RandomState(i).normal(0, 0.2, 4000)
        rows.append((i, "audio", bytearray(encode_wav(x, 16000))))
        if i % 3 == 0:
            tw = x + np.random.RandomState(7).normal(0, 5e-4, 4000)
            rows.append((i + 1000, "audio", bytearray(encode_wav(tw, 16000))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {(r.id_a, r.id_b) for r in audio_neardup_pairs(media, max_hamming=3).collect()}
    assert got == {(i, i + 1000) for i in range(0, 10, 3)}


# --- baseline JPEG codec (r13) ----------------------------------------------


def test_jpeg_roundtrip_smooth_and_solid():
    """Lossy but bounded: solid colors are DC-only (exact at q90);
    a smooth non-wrapping gradient survives within a few levels in
    both subsampling modes."""
    import numpy as np

    from hydraide_spark.functions.multimodal import encode_jpeg, jpeg_pixels

    solid = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    assert np.array_equal(jpeg_pixels(encode_jpeg(solid, quality=90)), solid)

    g = np.zeros((32, 32, 3), np.uint8)
    for i in range(32):
        for j in range(32):
            g[i, j] = (i * 4, j * 4, (i + j) * 2)
    for sub in ("444", "420"):
        dec = jpeg_pixels(encode_jpeg(g, quality=92, subsampling=sub))
        assert dec.shape == g.shape
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 6, sub


def test_jpeg_restart_markers_and_odd_dims():
    """DRI + RST0-7 resync must decode identically to the same image
    without restarts, including non-multiple-of-MCU dimensions (edge
    replication cropped back on decode)."""
    import numpy as np

    from hydraide_spark.functions.multimodal import encode_jpeg, jpeg_pixels

    px = np.random.RandomState(5).randint(0, 256, (17, 23, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        base = jpeg_pixels(encode_jpeg(px, quality=90, subsampling=sub))
        for ri in (1, 2, 5):
            withr = jpeg_pixels(
                encode_jpeg(px, quality=90, subsampling=sub, restart_interval=ri)
            )
            assert np.array_equal(base, withr), (sub, ri)
        assert base.shape == px.shape


def test_jpeg_refuses_arithmetic_and_12bit():
    """The PIL plug point stays loud: SOF9+ (arithmetic), SOF3/SOF5+
    (lossless/hierarchical), 12-bit precision, and truncated scans
    raise NotImplementedError — never a silent wrong decode. (SOF2
    progressive is REAL since r14 — see the progressive tests below;
    a baseline stream mutated to claim SOF2 still refuses loudly
    because its sequential SOS band Ss=0/Se=63 is invalid for a
    progressive DC scan.)"""
    import numpy as np
    import pytest as _pytest

    from hydraide_spark.functions.multimodal import encode_jpeg, jpeg_pixels

    px = np.random.RandomState(1).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    enc = encode_jpeg(px)
    for sof in (0xC2, 0xC9, 0xCB):
        bad = bytearray(enc)
        i = bad.find(b"\xff\xc0\x00\x11")
        bad[i + 1] = sof
        with _pytest.raises(NotImplementedError):
            jpeg_pixels(bytes(bad))
    bad = bytearray(enc)
    i = bad.find(b"\xff\xc0\x00\x11")
    bad[i + 4] = 12  # precision byte
    with _pytest.raises(NotImplementedError):
        jpeg_pixels(bytes(bad))
    with _pytest.raises(NotImplementedError):
        jpeg_pixels(enc[: len(enc) // 2])  # truncated scan
    with _pytest.raises(NotImplementedError):
        jpeg_pixels(b"\x00\x01not a jpeg")


# --- progressive JPEG (r14) ---------------------------------------------------


def test_jpeg_progressive_equals_baseline_decode():
    """Progressive transmission is a reordering of the SAME quantized
    coefficients: across content types (random / gradient / near-solid
    for long EOB runs), sizes, qualities and both subsamplings, the
    progressive decode must be BIT-IDENTICAL to decoding the baseline
    encode of the same image."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
        jpeg_pixels,
    )

    for seed in range(12):
        rs = np.random.RandomState(seed)
        h, w = rs.randint(8, 70), rs.randint(8, 70)
        kind = seed % 3
        if kind == 0:
            px = rs.randint(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            i, j = np.mgrid[0:h, 0:w]
            px = np.dstack(
                [(i * 3) % 256, (j * 3) % 256, ((i + j) * 2) % 256]
            ).astype(np.uint8)
        else:
            px = np.full((h, w, 3), 77, np.uint8)
            px[h // 2, w // 2] = 200
        q = [70, 85, 95][seed % 3]
        sub = "420" if seed % 2 else "444"
        dp = jpeg_pixels(encode_jpeg_progressive(px, quality=q, subsampling=sub))
        db = jpeg_pixels(encode_jpeg(px, quality=q, subsampling=sub))
        assert np.array_equal(dp, db), (seed, h, w, q, sub)


def test_jpeg_progressive_solid_exact_and_restarts():
    """Solid colors are DC-only and decode exactly through the whole
    successive-approximation ladder; DRI + RST markers inside
    progressive scans (predictor + EOB-run resets) decode identically
    to the restart-free stream, including odd dimensions."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        encode_jpeg_progressive,
        jpeg_pixels,
    )

    solid = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    assert np.array_equal(jpeg_pixels(encode_jpeg_progressive(solid)), solid)

    px = np.random.RandomState(5).randint(0, 256, (33, 41, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        base = jpeg_pixels(encode_jpeg_progressive(px, subsampling=sub))
        for ri in (1, 2, 5):
            withr = jpeg_pixels(
                encode_jpeg_progressive(px, subsampling=sub, restart_interval=ri)
            )
            assert np.array_equal(base, withr), (sub, ri)
        assert base.shape == px.shape


def test_jpeg_progressive_phash_neardup_planted(spark):
    """End-to-end: planted single-bit twins pair through the
    PROGRESSIVE JPEG round trip + dHash + hamming block join — and a
    baseline-encoded twin still pairs with a progressive-encoded
    original (the mixed-format case a real crawl hits)."""
    import numpy as np

    from hydraide_spark.functions.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
        image_neardup_pairs,
    )

    rows = []
    for i in range(8):
        px = np.random.RandomState(i).randint(0, 256, (32, 32, 3)).astype(np.uint8)
        sub = "420" if i % 2 else "444"
        rows.append(
            (i, "image", bytearray(encode_jpeg_progressive(px, subsampling=sub)))
        )
        if i % 3 == 0:
            tw = px.copy()
            tw[16, 16, 0] ^= 128
            enc = encode_jpeg if i % 2 else encode_jpeg_progressive
            rows.append((i + 1000, "image", bytearray(enc(tw, subsampling=sub))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(media, max_hamming=4).collect()
    }
    assert got == {(i, i + 1000) for i in range(0, 8, 3)}


def test_jpeg_phash_neardup_planted(spark):
    """End-to-end: planted single-bit twins pair through the JPEG
    round trip + dHash + hamming block join; unrelated noise images
    never pair (same margins the golden relies on)."""
    import numpy as np

    from hydraide_spark.functions.multimodal import encode_jpeg, image_neardup_pairs

    rows = []
    for i in range(8):
        px = np.random.RandomState(i).randint(0, 256, (32, 32, 3)).astype(np.uint8)
        sub = "420" if i % 2 else "444"
        rows.append((i, "image", bytearray(encode_jpeg(px, subsampling=sub))))
        if i % 3 == 0:
            tw = px.copy()
            tw[16, 16, 0] ^= 128
            rows.append(
                (i + 1000, "image", bytearray(encode_jpeg(tw, subsampling=sub)))
            )
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(media, max_hamming=4).collect()
    }
    assert got == {(i, i + 1000) for i in range(0, 8, 3)}


def test_webp_vp8l_round_trips_every_feature():
    """r15 WebP lossless: each decoder path pinned by an exact pixel
    round-trip — plain literals, color cache, subtract-green, every
    predictor mode family (incl. Select and the clamp add/subtract
    pair), LZ77 through BOTH distance classes, and palettes at every
    sub-byte bundling width."""
    import numpy as np

    from hydraide_spark.functions.webp import encode_webp_vp8l, webp_pixels

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    for kw in (
        dict(),
        dict(cache_bits=6),
        dict(subtract_green=True),
        dict(predictor=0),
        dict(predictor=2),
        dict(predictor=5),
        dict(predictor=11),
        dict(predictor=12),
        dict(predictor=13),
        dict(subtract_green=True, predictor=7),
        dict(lz77=True),
        dict(lz77=True, cache_bits=4),
    ):
        out = webp_pixels(encode_webp_vp8l(img, **kw))
        assert (out == img).all(), kw

    # flat regions force real LZ77 runs (vertical neighbor-mapped +
    # horizontal raw-distance) and cache hits
    flat = np.zeros((16, 16, 3), np.uint8)
    flat[:8] = [10, 20, 30]
    flat[8:] = [200, 100, 50]
    flat[3, 5] = [1, 2, 3]
    p = encode_webp_vp8l(flat, lz77=True, cache_bits=5)
    assert len(p) < 200  # the runs actually compressed
    assert (webp_pixels(p) == flat).all()

    for ncol in (2, 3, 4, 9, 16, 17, 200):  # every bundling width
        cols = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
        pimg = cols[rng.randint(0, ncol, size=(11, 23))]
        assert (webp_pixels(encode_webp_vp8l(pimg, palette=True)) == pimg).all()


def test_webp_refusals_and_meta():
    """Lossy VP8 and extended VP8X raise loudly (the silent-NULL exit
    the r14 VERDICT flagged is gone); real_decode reads VP8L dims."""
    import numpy as np
    import pytest

    from hydraide_spark.functions.multimodal import image_pixels, real_decode
    from hydraide_spark.functions.webp import encode_webp_vp8l, webp_pixels

    def riff(fourcc, body):
        return (
            b"RIFF"
            + (4 + 8 + len(body)).to_bytes(4, "little")
            + b"WEBP"
            + fourcc
            + len(body).to_bytes(4, "little")
            + body
        )

    with pytest.raises(NotImplementedError, match="lossy"):
        webp_pixels(riff(b"VP8 ", b"\x00" * 16))
    with pytest.raises(NotImplementedError, match="extended"):
        webp_pixels(riff(b"VP8X", b"\x00" * 10))
    with pytest.raises(NotImplementedError):
        webp_pixels(b"not a webp at all----")

    img = np.random.RandomState(3).randint(0, 256, (21, 34, 3)).astype(np.uint8)
    payload = encode_webp_vp8l(img)
    # dispatch: image_pixels routes RIFF/WEBP to the VP8L decoder
    assert (image_pixels(payload) == img).all()
    meta = real_decode(payload, "image")
    assert (meta["format"], meta["width"], meta["height"]) == ("webp", 34, 21)


def test_webp_phash_neardup_planted(spark):
    """End-to-end: planted single-bit twins pair through the WebP
    round trip + dHash + hamming block join, with encode features
    cycling; unrelated noise images never pair."""
    import numpy as np

    from hydraide_spark.functions.multimodal import image_neardup_pairs
    from hydraide_spark.functions.webp import encode_webp_vp8l

    def enc(px, i):
        v = i % 4
        if v == 0:
            return encode_webp_vp8l(px)
        if v == 1:
            return encode_webp_vp8l(px, cache_bits=8)
        if v == 2:
            return encode_webp_vp8l(px, subtract_green=True, predictor=11)
        return encode_webp_vp8l(px, lz77=True, cache_bits=5)

    rows = []
    for i in range(8):
        px = np.random.RandomState(i).randint(0, 256, (32, 32, 3)).astype(np.uint8)
        rows.append((i, "image", bytearray(enc(px, i))))
        if i % 3 == 0:
            tw = px.copy()
            tw[16, 16, 0] ^= 128
            rows.append((i + 1000, "image", bytearray(enc(tw, i))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(media, max_hamming=3).collect()
    }
    assert got == {(i, i + 1000) for i in range(0, 8, 3)}


def test_gif_round_trips_and_refusals():
    """r15 GIF: LZW (variable width, 12-bit growth, clear/reset),
    interlace, global/local color tables — each pinned by exact pixel
    round-trip; non-GIF and table-less streams refuse loudly;
    real_decode reads the screen descriptor dims."""
    import numpy as np
    import pytest

    from hydraide_spark.functions.gif import encode_gif, gif_pixels
    from hydraide_spark.functions.multimodal import image_pixels, real_decode

    rng = np.random.RandomState(5)
    for ncol in (2, 3, 16, 200, 256):
        cols = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
        img = cols[rng.randint(0, ncol, size=(19, 31))]
        for kw in (
            dict(),
            dict(interlace=True),
            dict(local_table=True),
            dict(interlace=True, local_table=True),
        ):
            assert (gif_pixels(encode_gif(img, **kw)) == img).all(), (ncol, kw)

    # 128x128 @ 256 colors forces the 12-bit dictionary path
    cols = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    big = cols[rng.randint(0, 256, size=(128, 128))]
    payload = encode_gif(big)
    assert (image_pixels(payload) == big).all()  # dispatch routes GIF
    meta = real_decode(payload, "image")
    assert (meta["format"], meta["width"], meta["height"]) == ("gif", 128, 128)

    with pytest.raises(NotImplementedError):
        gif_pixels(b"NOTAGIF-------")
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8))


def test_gif_phash_neardup_planted(spark):
    """End-to-end: planted single-index twins pair through the GIF
    round trip + dHash + hamming block join; unrelated palette-noise
    images never pair."""
    import numpy as np

    from hydraide_spark.functions.gif import encode_gif
    from hydraide_spark.functions.multimodal import image_neardup_pairs

    rows = []
    for i in range(8):
        rng = np.random.RandomState(i)
        pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
        idx = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
        kw = dict(interlace=bool(i % 2), local_table=bool((i >> 1) % 2))
        rows.append((i, "image", bytearray(encode_gif(pal[idx], **kw))))
        if i % 3 == 0:
            tw = idx.copy()
            tw[16, 16] ^= 128
            rows.append((i + 1000, "image", bytearray(encode_gif(pal[tw], **kw))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(media, max_hamming=3).collect()
    }
    assert got == {(i, i + 1000) for i in range(0, 8, 3)}
