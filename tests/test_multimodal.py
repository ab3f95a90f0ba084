"""Multimodal tests: binary columns flow through mapInPandas stages
with real schema/batching, and decode is REAL where claimed — crafted
PNG/GIF/JPEG (baseline + progressive) fixtures with full pixel
assertions, WAV/MP4/AVI containers, area-average resize goldens,
AVI/MJPEG frame extraction. Only unrecognized-byte dims
(extract_features) and H.264-class frames stay stubbed."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from electrician_spark import multimodal as mm
from electrician_spark.io import read_table
from tests.conftest import SF_SMOKE


def test_attach_binary_schema(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = mm.attach_binary(docs, "text")
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == docs.count()


def test_extract_features_matches_local_hash(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(20)
    media = mm.attach_binary(docs, "text")
    feats = mm.extract_features(media).collect()
    assert len(feats) == 20
    texts = {r.text.encode("utf-8") for r in docs.collect()}
    hashes = {hashlib.sha256(t).hexdigest() for t in texts}
    for r in feats:
        # text payloads are not image containers: err channel with
        # NULL dims, byte stats still real
        assert r.ok.startswith("error:")
        assert r.sha256 in hashes
        assert r.n_bytes > 0
        assert r.width is None and r.height is None


def test_extract_features_error_column_not_task_failure(spark):
    media = spark.createDataFrame(
        [(1, "image", "application/octet-stream", None, "s://x")],
        mm.MEDIA_SCHEMA,
    )
    r = mm.extract_features(media).collect()[0]
    assert r.ok.startswith("error:")
    assert r.n_bytes == 0 and r.sha256 is None


def test_frame_sample_plan_explodes(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(5)
    media = mm.attach_binary(docs, "text", modality="video")
    frames = mm.frame_sample_plan(media, every_n=1)
    per_media = frames.groupBy("media_id").count().collect()
    assert len(per_media) == 5
    assert all(r["count"] >= 1 for r in per_media)


def test_size_partitions_spreads(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    media = mm.attach_binary(docs, "text")
    spread = mm.size_partitions(media, n_buckets=8)
    assert spread.rdd.getNumPartitions() == 8
    assert spread.count() == media.count()


def test_resize_plan_real_pixels_and_error_channel(spark):
    """REAL resize: a crafted 8x4 RGB PNG downscales to 4x2 by exact
    area averaging (each target pixel = mean of its 2x2 source block —
    golden values), a constant-color image stays constant, and
    non-image payloads land in the err channel."""
    from pyspark.sql import Row

    from electrician_spark import multimodal as mm

    # 8x4 gradient: pixel (x, y) = (x*30, y*60, 100)
    grad = bytearray()
    for y in range(4):
        for x in range(8):
            grad += bytes([x * 30, y * 60, 100])
    const = bytes([7, 99, 200]) * (8 * 4)
    rows = [
        Row(media_id=1, modality="image", mime="image/png",
            payload=bytearray(_full_png(8, 4, bytes(grad))), source_uri="f:1"),
        Row(media_id=2, modality="image", mime="image/png",
            payload=bytearray(_full_png(8, 4, const)), source_uri="f:2"),
        Row(media_id=3, modality="image", mime="text/plain",
            payload=bytearray(b"not an image at all"), source_uri="f:3"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.resize_plan(media, max_side=4).collect()}
    r1 = out[1]
    assert (r1.target_w, r1.target_h, r1.channels, r1.ok) == (4, 2, 3, "ok")
    px = bytes(r1.resized)
    assert len(px) == 4 * 2 * 3
    # golden: target (tx, ty) averages source x in {2tx, 2tx+1}, y in
    # {2ty, 2ty+1} -> R = 30*(2tx) + 15, G = 60*(2ty) + 30, B = 100
    for ty in range(2):
        for tx in range(4):
            r, g, b = px[(ty * 4 + tx) * 3 : (ty * 4 + tx) * 3 + 3]
            assert (r, g, b) == (60 * tx + 15, 120 * ty + 30, 100)
    r2 = out[2]
    assert bytes(r2.resized) == bytes([7, 99, 200]) * (4 * 2)
    assert out[3].ok.startswith("err:") and out[3].target_w == 0
    # deterministic across runs (pure float64 arithmetic, no RNG)
    again = {r.media_id: r for r in mm.resize_plan(media, max_side=4).collect()}
    assert bytes(again[1].resized) == px


def test_resize_plan_no_upscale_passthrough(spark):
    """Images already within max_side pass through with their exact
    decoded pixels (no resample, no upscale)."""
    from pyspark.sql import Row

    from electrician_spark import multimodal as mm

    body = bytes(range(48))  # 4x4 RGB
    media = spark.createDataFrame(
        [Row(media_id=1, modality="image", mime="image/png",
             payload=bytearray(_full_png(4, 4, body)), source_uri="f:1")],
        mm.MEDIA_SCHEMA,
    )
    (r,) = mm.resize_plan(media, max_side=128).collect()
    assert (r.target_w, r.target_h, r.channels, r.ok) == (4, 4, 3, "ok")
    assert bytes(r.resized) == body


def _png(w: int, h: int) -> bytes:
    import struct as st
    import zlib

    ihdr = st.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = st.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += st.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk + b"\x00" * 16


def _jpeg(w: int, h: int) -> bytes:
    import struct as st

    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + st.pack(">H", 4) + b"\x00\x00"  # bogus-but-walkable table segment
    sof0 = b"\xff\xc0" + st.pack(">HBHHB", 8, 8, h, w, 1) + b"\x00" * 0
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _gif(w: int, h: int) -> bytes:
    import struct as st

    return b"GIF89a" + st.pack("<HH", w, h) + b"\x00" * 8


def test_parse_image_dims_real_headers():
    from electrician_spark.multimodal import parse_image_dims

    assert parse_image_dims(_png(640, 480)) == (640, 480)
    assert parse_image_dims(_jpeg(1024, 768)) == (1024, 768)
    assert parse_image_dims(_gif(320, 200)) == (320, 200)
    # non-images fall through to None (the stub path)
    assert parse_image_dims(b"plain text payload") is None
    assert parse_image_dims(b"\x89PNG\r\n\x1a\nXXXX") is None  # truncated IHDR
    assert parse_image_dims(b"\xff\xd8\x00\x00") is None  # JPEG with broken marker


def test_extract_features_real_image_dimensions(spark):
    """The mapInPandas feature path must report REAL width/height for
    genuine PNG/JPEG/GIF payloads (header parse, no codec), and keep
    the deterministic stub for unrecognized bytes."""
    from pyspark.sql import Row

    from electrician_spark import multimodal as mm

    rows = [
        Row(media_id=1, modality="image", mime="image/png",
            payload=bytearray(_png(800, 600)), source_uri="f:1"),
        Row(media_id=2, modality="image", mime="image/jpeg",
            payload=bytearray(_jpeg(256, 384)), source_uri="f:2"),
        Row(media_id=3, modality="image", mime="image/gif",
            payload=bytearray(_gif(64, 32)), source_uri="f:3"),
        Row(media_id=4, modality="image", mime="application/octet-stream",
            payload=bytearray(b"not an image"), source_uri="f:4"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert (out[1].width, out[1].height) == (800, 600)
    assert (out[2].width, out[2].height) == (256, 384)
    assert (out[3].width, out[3].height) == (64, 32)
    assert all(out[i].ok == "ok" for i in (1, 2, 3))
    # unrecognized bytes: err channel with NULL dims, byte stats kept
    # (no fabricated dimensions anywhere in the tree)
    import hashlib

    assert out[4].ok.startswith("error:")
    assert (out[4].width, out[4].height) == (None, None)
    assert out[4].sha256 == hashlib.sha256(b"not an image").hexdigest()
    assert out[4].n_bytes == len(b"not an image")


def test_resize_plan_uses_real_dims(spark):
    """Aspect-preserving targets derive from the REAL decoded dims:
    a 160x120 PNG at max_side=128 -> 128x96, with the pixel mass
    preserved (area averaging keeps the global mean)."""
    from pyspark.sql import Row

    from electrician_spark import multimodal as mm

    w, h = 160, 120
    body = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w) for _ in range(3))
    media = spark.createDataFrame(
        [Row(media_id=1, modality="image", mime="image/png",
             payload=bytearray(_full_png(w, h, body)), source_uri="f:1")],
        mm.MEDIA_SCHEMA,
    )
    (r,) = mm.resize_plan(media, max_side=128).collect()
    assert (r.target_w, r.target_h, r.ok) == (128, 96, "ok")
    assert len(r.resized) == 128 * 96 * 3
    src_mean = sum(body) / len(body)
    dst = bytes(r.resized)
    dst_mean = sum(dst) / len(dst)
    assert abs(src_mean - dst_mean) < 1.0  # box filter preserves mass


# --- real PNG pixel decode -------------------------------------------------


def _full_png(w, h, pixels, ctype=2, filters=None, palette=None):
    """Craft a complete PNG from raw pixel rows: apply the requested
    per-row filter (the encode direction — the decoder must invert it),
    deflate, and wrap in IHDR/PLTE/IDAT/IEND with real CRCs."""
    import struct as st
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * channels
    bpp = channels
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray(line)
        if f == 1:
            for x in range(stride - 1, bpp - 1, -1):
                enc[x] = (line[x] - line[x - bpp]) & 0xFF
        elif f == 2:
            for x in range(stride):
                enc[x] = (line[x] - prev[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 0xFF
        raw.append(f)
        raw.extend(enc)
        prev = line

    def chunk(typ, data):
        return (
            st.pack(">I", len(data)) + typ + data + st.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = st.pack(">II5B", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_decode_png_pixels_all_filters_roundtrip():
    # 4x5 RGB with a deterministic gradient; encode once per filter
    # type (incl. mixed) — the decoder must invert every filter exactly.
    w, h = 4, 5
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * 3))
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        png = _full_png(w, h, pixels, ctype=2, filters=filters)
        gw, gh, ch, got = mm.decode_png_pixels(png)
        assert (gw, gh, ch) == (w, h, 3)
        assert got == pixels, f"filters={filters}"


def test_decode_png_pixels_gray_alpha_and_palette():
    # grayscale (ctype 0)
    w, h = 3, 2
    gray = bytes(range(w * h))
    gw, gh, ch, got = mm.decode_png_pixels(_full_png(w, h, gray, ctype=0, filters=[2, 1]))
    assert (gw, gh, ch) == (w, h, 1) and got == gray
    # palette (ctype 3) expands to RGB through PLTE
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 1, 2, 2, 1, 0])
    gw, gh, ch, got = mm.decode_png_pixels(
        _full_png(3, 2, idx, ctype=3, palette=palette)
    )
    assert (gw, gh, ch) == (3, 2, 3)
    assert got == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_decode_png_pixels_rejects_unsupported():
    import pytest

    with pytest.raises(ValueError):
        mm.decode_png_pixels(b"not a png at all")
    with pytest.raises(ValueError):
        mm.decode_png_pixels(_png(4, 4))  # header-only, no IDAT
    with pytest.raises(ValueError):
        mm.decode_png_pixels(_jpeg(4, 4))


def test_image_pixel_stats_real_values_and_error_channel(spark):
    from pyspark.sql import Row

    w, h = 4, 3
    pixels = bytes((x * 7) % 256 for x in range(w * h * 3))
    png = _full_png(w, h, pixels, ctype=2, filters=[4] * h)
    media = spark.createDataFrame(
        [
            Row(media_id=1, modality="image", mime="image/png",
                payload=bytearray(png), source_uri="f:1"),
            Row(media_id=2, modality="image", mime="image/gif",
                payload=bytearray(_gif(2, 2)), source_uri="f:2"),
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.image_pixel_stats(media).collect()}
    good = rows[1]
    assert (good.width, good.height, good.channels, good.ok) == (w, h, 3, "ok")
    assert good.mean_luma == f"{sum(pixels) / len(pixels):.6f}"
    assert good.min_sample == min(pixels) and good.max_sample == max(pixels)
    # header-only GIF (no image frame): error channel, not task failure
    assert rows[2].ok.startswith("err:") and rows[2].width is None


# --- real GIF pixel decode -------------------------------------------------


def _lzw_encode(min_code_size, indices):
    """Test-side GIF-LZW encoder (clear + variable-width LSB-first
    codes, width grows once code 2^cs − 1 is assigned) — the decoder
    must invert real encoder output, not just header-walk."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_bits = [(clear, code_size)]
    prev = b""
    for px in indices:
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], code_size))
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = bytes([px])
    if prev:
        out_bits.append((table[prev], code_size))
    out_bits.append((eoi, code_size))
    acc = nbits = 0
    data = bytearray()
    for code, size in out_bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


_GIF_PALETTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def _full_gif(w, h, indices, interlace=False):
    import struct as st

    hdr = b"GIF89a" + st.pack("<HH", w, h) + bytes([0x81, 0, 0]) + _GIF_PALETTE
    data = _lzw_encode(2, indices)
    sub = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    img = (
        b"\x2C"
        + st.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlace else 0, 2])
        + sub
        + b"\x00"
    )
    return hdr + img + b"\x3B"


def test_decode_gif_pixels_lzw_roundtrip_with_width_growth():
    import random

    random.seed(3)
    w = h = 64  # big enough to push LZW through 3→4→5+ bit code widths
    idx = bytes(random.randrange(4) for _ in range(w * h))
    gw, gh, ch, rgb = mm.decode_gif_pixels(_full_gif(w, h, idx))
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(_GIF_PALETTE[3 * i : 3 * i + 3] for i in idx)


def test_decode_gif_pixels_interlaced():
    w, h = 5, 9
    idx = bytes((i * 3 + 1) % 4 for i in range(w * h))
    rows = [idx[r * w : (r + 1) * w] for r in range(h)]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = b"".join(rows[dst] for dst in order)  # pass-ordered scanlines
    gw, gh, ch, rgb = mm.decode_gif_pixels(_full_gif(w, h, stored, interlace=True))
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(_GIF_PALETTE[3 * i : 3 * i + 3] for i in idx)


def test_image_pixel_stats_decodes_gif(spark):
    from pyspark.sql import Row

    w, h = 6, 4
    idx = bytes((i * 5 + 2) % 4 for i in range(w * h))
    media = spark.createDataFrame(
        [Row(media_id=9, modality="image", mime="image/gif",
             payload=bytearray(_full_gif(w, h, idx)), source_uri="f:9")],
        schema=mm.MEDIA_SCHEMA,
    )
    r = mm.image_pixel_stats(media).collect()[0]
    pixels = b"".join(_GIF_PALETTE[3 * i : 3 * i + 3] for i in idx)
    assert (r.width, r.height, r.channels, r.ok) == (w, h, 3, "ok")
    assert r.mean_luma == f"{sum(pixels) / len(pixels):.6f}"


# --- real WAV audio decode ---------------------------------------------------


def _wav(rate=8000, nch=1, width=2, samples=None):
    import io
    import struct as st
    import wave as wv

    samples = samples if samples is not None else [0, 1000, -1000, 32767, -32768]
    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 4:
            w.writeframes(st.pack(f"<{len(samples)}i", *samples))
        elif width == 2:
            w.writeframes(st.pack(f"<{len(samples)}h", *samples))
        elif width == 1:
            w.writeframes(bytes((s + 128) & 0xFF for s in samples))
    return buf.getvalue(), samples


def test_decode_wav_pcm_16_and_8_bit():
    blob, samples = _wav(width=2)
    rate, nch, got = mm.decode_wav_pcm(blob)
    assert (rate, nch) == (8000, 1) and got == samples
    blob8, samples8 = _wav(width=1, samples=[-128, 0, 127, 5])
    rate, nch, got = mm.decode_wav_pcm(blob8)
    assert got == samples8
    import pytest

    with pytest.raises(ValueError):
        mm.decode_wav_pcm(b"not riff")


def test_audio_feature_stats_real_values(spark):
    import math

    from pyspark.sql import Row

    samples = [0, 3000, -3000, 12000, -12000, 6000]
    blob, _ = _wav(rate=16000, samples=samples)
    media = spark.createDataFrame(
        [
            Row(media_id=1, modality="audio", mime="audio/wav",
                payload=bytearray(blob), source_uri="f:1"),
            Row(media_id=2, modality="audio", mime="audio/wav",
                payload=bytearray(b"JUNKJUNKJUNK"), source_uri="f:2"),
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.audio_feature_stats(media).collect()}
    good = rows[1]
    assert (good.sample_rate, good.n_channels, good.n_samples, good.ok) == (
        16000, 1, len(samples), "ok")
    assert good.duration_ms == len(samples) * 1000 // 16000
    want_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert good.rms == f"{want_rms:.6f}"
    assert good.peak == 12000
    assert rows[2].ok.startswith("err:") and rows[2].sample_rate is None


# --- MP4 metadata box walking ------------------------------------------------


def _mp4(duration_s=12.5, timescale=1000, w=640, h=360):
    import struct as st

    def box(typ, body):
        return st.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes(4) + bytes(8) + st.pack(">II", timescale, int(duration_s * timescale)) + bytes(80)
    # tkhd v0: 8 bytes times, u32 track id, 4 reserved, u32 duration,
    # 8 reserved, 2+2 layer/group, 2+2 volume/reserved, 36 matrix, w, h
    tkhd_body = bytes(4) + bytes(8) + st.pack(">I", 1) + bytes(4) + bytes(4) \
        + bytes(8) + bytes(8) + bytes(36) + st.pack(">II", w << 16, h << 16)
    trak = box(b"trak", box(b"tkhd", tkhd_body))
    moov = box(b"moov", box(b"mvhd", mvhd) + trak)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_parse_mp4_meta_duration_and_dims():
    dur, w, h = mm.parse_mp4_meta(_mp4())
    assert abs(dur - 12.5) < 1e-9
    assert (w, h) == (640, 360)
    import pytest

    with pytest.raises(ValueError):
        mm.parse_mp4_meta(b"\x00\x00\x00\x08free")


# --- real baseline JPEG pixel decode -----------------------------------------

# Standard Annex K luminance/chrominance huffman tables (public spec
# constants) — used by the test-side encoder only.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _encode_jpeg_gray(pixels, w, h):
    """Test-side baseline JPEG encoder (grayscale, quant table all
    ones, standard huffman tables): FDCT + zigzag + huffman + stuffing.
    The decoder must invert it within coefficient-rounding tolerance."""
    import struct as st

    import numpy as np

    from electrician_spark.multimodal import _JPEG_ZIGZAG, _jpeg_huff_table

    # encode-direction huffman: symbol -> (code, length)
    def enc_table(bits, vals):
        dec = _jpeg_huff_table(bits, vals)
        return {sym: (code, ln) for (ln, code), sym in dec.items()}

    dc_t, ac_t = enc_table(_DC_BITS, _DC_VALS), enc_table(_AC_BITS, _AC_VALS)
    u = np.arange(8)
    M = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    M[0, :] *= 1 / np.sqrt(2)

    img = np.zeros((-(-h // 8) * 8, -(-w // 8) * 8))
    img[:h, :w] = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(h, w)
    img[h:, :] = img[h - 1 : h, :]  # edge-pad
    img[:, w:] = img[:, w - 1 : w]

    out_bits: list[tuple[int, int]] = []

    def emit(code, ln):
        out_bits.append((code, ln))

    def emit_val(v):
        s = v.bit_length() if v > 0 else (-v).bit_length()
        if s:
            emit(v if v > 0 else v + (1 << s) - 1, s)
        return s

    pred = 0
    for by in range(img.shape[0] // 8):
        for bx in range(img.shape[1] // 8):
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = M @ block @ M.T
            zz = [int(round(coef.flat[z])) for z in _JPEG_ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            s = diff.bit_length() if diff > 0 else (-diff).bit_length()
            emit(*dc_t[s])
            if s:
                emit(diff if diff > 0 else diff + (1 << s) - 1, s)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    emit(*ac_t[0x00])  # EOB
                    break
                while run > 15:
                    emit(*ac_t[0xF0])  # ZRL
                    run -= 16
                v = zz[k]
                s = v.bit_length() if v > 0 else (-v).bit_length()
                emit(*ac_t[(run << 4) | s])
                emit(v if v > 0 else v + (1 << s) - 1, s)
                k += 1

    acc = nbits = 0
    data = bytearray()
    for code, ln in out_bits:
        acc = (acc << ln) | (code & ((1 << ln) - 1))
        nbits += ln
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            data.append(b)
            if b == 0xFF:
                data.append(0x00)  # byte stuffing
            nbits -= 8
    if nbits:
        b = ((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
        data.append(b)
        if b == 0xFF:
            data.append(0x00)

    def seg(marker, body):
        return bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + st.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(data) + b"\xff\xd9"


def test_decode_jpeg_roundtrip_within_rounding():
    import numpy as np

    w, h = 19, 13  # non-multiple-of-8: exercises edge blocks + crop
    pixels = bytes(((x * 7) ^ (x >> 3)) % 256 for x in range(w * h))
    jpg = _encode_jpeg_gray(pixels, w, h)
    gw, gh, ch, got = mm.decode_jpeg_pixels(jpg)
    assert (gw, gh, ch) == (w, h, 1)
    a = np.frombuffer(got, dtype=np.uint8).astype(int)
    b = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(int)
    # quant table of ones: the only loss is FDCT coefficient rounding —
    # bounded by a few levels per sample
    assert np.abs(a - b).max() <= 4, np.abs(a - b).max()


# --- progressive JPEG (SOF2) decode ------------------------------------------


class _BitPack:
    """MSB-first bit packer with 0xFF00 stuffing and 1-padding flush —
    one instance per entropy-coded scan."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.data = bytearray()

    def emit(self, code, ln):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.data.append(b)
            if b == 0xFF:
                self.data.append(0x00)
            self.n -= 8

    def flush(self):
        if self.n:
            b = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)) & 0xFF
            self.data.append(b)
            if b == 0xFF:
                self.data.append(0x00)
            self.n = 0
        return bytes(self.data)


def _jpeg_zz_blocks(pixels, w, h):
    """FDCT + natural-order integer coefficients per 8x8 block (quant
    table all ones), row-major block order — the shared coefficient
    source for the baseline and progressive test encoders."""
    import numpy as np

    from electrician_spark.multimodal import _JPEG_ZIGZAG

    u = np.arange(8)
    M = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    M[0, :] *= 1 / np.sqrt(2)
    img = np.zeros((-(-h // 8) * 8, -(-w // 8) * 8))
    img[:h, :w] = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(h, w)
    img[h:, :] = img[h - 1 : h, :]
    img[:, w:] = img[:, w - 1 : w]
    blocks = []
    for by in range(img.shape[0] // 8):
        for bx in range(img.shape[1] // 8):
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = M @ block @ M.T
            blocks.append([int(round(coef.flat[z])) for z in _JPEG_ZIGZAG])
    return blocks


_PROG_AC_BITS = [0] * 8 + [255, 1] + [0] * 6  # flat canonical table:
_PROG_AC_VALS = bytes(range(256))  # progressive scans need EOBn symbols


def _prog_tables():
    from electrician_spark.multimodal import _jpeg_huff_table

    def enc_table(bits, vals):
        dec = _jpeg_huff_table(bits, vals)
        return {sym: (code, ln) for (ln, code), sym in dec.items()}

    return enc_table(_DC_BITS, _DC_VALS), enc_table(_PROG_AC_BITS, _PROG_AC_VALS)


def _scan_dc_first(seq, dc_t, al):
    """seq: (comp_key, zz) in MCU order. DC point transform is an
    arithmetic shift (unlike AC's truncate-toward-zero)."""
    bp = _BitPack()
    pred = {}
    for ck, zz in seq:
        v = zz[0] >> al
        diff = v - pred.get(ck, 0)
        pred[ck] = v
        s = diff.bit_length() if diff > 0 else (-diff).bit_length()
        bp.emit(*dc_t[s])
        if s:
            bp.emit(diff if diff > 0 else diff + (1 << s) - 1, s)
    return bp.flush()


def _scan_dc_refine(seq, al):
    bp = _BitPack()
    for _ck, zz in seq:
        bp.emit((zz[0] >> al) & 1, 1)
    return bp.flush()


def _scan_ac_first(blocks, ss, se, al, ac_t):
    bp = _BitPack()
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            bp.emit(*ac_t[nbits << 4])
            if nbits:
                bp.emit(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for zz in blocks:
        r = 0
        emitted = False
        for k in range(ss, se + 1):
            v = zz[k]
            mag = (v if v >= 0 else -v) >> al  # truncate toward zero
            if mag == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                bp.emit(*ac_t[0xF0])
                r -= 16
            s = mag.bit_length()
            sv = mag if v >= 0 else -mag
            bp.emit(*ac_t[(r << 4) | s])
            bp.emit(sv if sv > 0 else sv + (1 << s) - 1, s)
            r = 0
            emitted = True
        if r > 0 or not emitted:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    return bp.flush()


def _scan_ac_refine(blocks, ss, se, al, ac_t):
    """Exact positional mirror of the decoder's walk (jdphuff
    structure): correction bits for history-nonzero coefficients are
    emitted interleaved by POSITION within each symbol's span (a ZRL
    span covers exactly 16 zero-history positions; a significance
    symbol's span covers its r skipped zeros); EOB-run blocks buffer
    their tail correction bits until the EOBn symbol flushes."""
    bp = _BitPack()
    eobrun = 0
    be: list[int] = []

    def flush_eob():
        nonlocal eobrun, be
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            bp.emit(*ac_t[nbits << 4])
            if nbits:
                bp.emit(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in be:
                bp.emit(b, 1)
            be = []

    for zz in blocks:
        absv = {k: (zz[k] if zz[k] >= 0 else -zz[k]) >> al for k in range(ss, se + 1)}
        newpos = [k for k in range(ss, se + 1) if absv[k] == 1]
        k = ss
        for p in newpos:
            r = sum(1 for q in range(k, p) if absv[q] == 0)
            while r > 15:
                flush_eob()
                bp.emit(*ac_t[0xF0])
                zeros = 0
                while zeros < 16:  # the decoder's 16-zero span walk
                    if absv[k] == 0:
                        zeros += 1
                    elif absv[k] > 1:
                        bp.emit(absv[k] & 1, 1)
                    k += 1
                r -= 16
            flush_eob()
            bp.emit(*ac_t[(r << 4) | 1])
            bp.emit(0 if zz[p] < 0 else 1, 1)
            for q in range(k, p):
                if absv[q] > 1:
                    bp.emit(absv[q] & 1, 1)
            k = p + 1
        if k <= se:  # tail remains: this block ends in an EOB run
            eobrun += 1
            be.extend(absv[q] & 1 for q in range(k, se + 1) if absv[q] > 1)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return bp.flush()


def _jseg(marker, body):
    import struct as st

    return bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body


def _encode_jpeg_gray_progressive(pixels, w, h):
    """Test-side PROGRESSIVE (SOF2) grayscale encoder mirroring
    libjpeg's jcphuff scan logic: DC first/refine with the arithmetic-
    shift point transform, AC first/refine over spectral bands with
    EOB runs and buffered correction bits. Scan script: DC Al=1; AC
    1-5 Al=2; AC 6-63 Al=2; DC refine; AC refinements down to Al=0 —
    full precision, so the decode must equal the baseline decode of
    the same coefficients bit-for-bit."""
    import struct as st

    dc_t, ac_t = _prog_tables()
    blocks = _jpeg_zz_blocks(pixels, w, h)
    seq = [(0, zz) for zz in blocks]

    def sos(ss, se, ah, al, entropy):
        return _jseg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + entropy

    dqt = _jseg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _jseg(0xC2, bytes([8]) + st.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = _jseg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS) + _jseg(
        0xC4, bytes([0x10]) + bytes(_PROG_AC_BITS) + _PROG_AC_VALS
    )
    scans = (
        sos(0, 0, 0, 1, _scan_dc_first(seq, dc_t, 1))
        + sos(1, 5, 0, 2, _scan_ac_first(blocks, 1, 5, 2, ac_t))
        + sos(6, 63, 0, 2, _scan_ac_first(blocks, 6, 63, 2, ac_t))
        + sos(0, 0, 1, 0, _scan_dc_refine(seq, 0))
        + sos(1, 5, 2, 1, _scan_ac_refine(blocks, 1, 5, 1, ac_t))
        + sos(6, 63, 2, 1, _scan_ac_refine(blocks, 6, 63, 1, ac_t))
        + sos(1, 5, 1, 0, _scan_ac_refine(blocks, 1, 5, 0, ac_t))
        + sos(6, 63, 1, 0, _scan_ac_refine(blocks, 6, 63, 0, ac_t))
    )
    return b"\xff\xd8" + dqt + sof + dht + scans + b"\xff\xd9"


def _plane_zz_grid(plane, rows_b, cols_b):
    """Per-block natural-order FDCT coefficients for one component
    plane, edge-padded to the (rows_b, cols_b) 8x8 block grid."""
    import numpy as np

    from electrician_spark.multimodal import _JPEG_ZIGZAG

    u = np.arange(8)
    M = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    M[0, :] *= 1 / np.sqrt(2)
    ph, pw = plane.shape
    padded = np.zeros((rows_b * 8, cols_b * 8))
    padded[:ph, :pw] = plane
    padded[ph:, :] = padded[ph - 1 : ph, :]
    padded[:, pw:] = padded[:, pw - 1 : pw]
    grid = []
    for by in range(rows_b):
        row = []
        for bx in range(cols_b):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = M @ block @ M.T
            row.append([int(round(coef.flat[z])) for z in _JPEG_ZIGZAG])
        grid.append(row)
    return grid


def _encode_jpeg_color_pair(y, cb, cr, w, h):
    """Encode the same 4:2:0 YCbCr planes as (baseline, progressive):
    baseline = one interleaved scan; progressive = interleaved DC
    first/refine + per-component non-interleaved AC scans (the
    geometry progressive decoders must get right: AC scans cover
    ceil(comp/8) blocks, not the MCU-padded grid)."""
    import struct as st

    dc_t, ac_t = _prog_tables()
    comps = [(1, 2, 2, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    mcux, mcuy = -(-w // 16), -(-h // 16)
    grids = {}
    for cid, hsf, vsf, plane in comps:
        grids[cid] = _plane_zz_grid(plane, mcuy * vsf, mcux * hsf)

    # MCU-ordered interleaved sequence
    mcu_seq = []
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hsf, vsf, _p in comps:
                for by in range(vsf):
                    for bx in range(hsf):
                        mcu_seq.append((cid, grids[cid][my * vsf + by][mx * hsf + bx]))

    # per-component NON-interleaved block order (AC scan geometry)
    nonint = {}
    for cid, hsf, vsf, plane in comps:
        nbx = -(-plane.shape[1] // 8)
        nby = -(-plane.shape[0] // 8)
        nonint[cid] = [grids[cid][by][bx] for by in range(nby) for bx in range(nbx)]

    dqt = _jseg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = bytes([8]) + st.pack(">HH", h, w) + bytes([3])
    for cid, hsf, vsf, _p in comps:
        sof_body += bytes([cid, (hsf << 4) | vsf, 0])
    dht = _jseg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS) + _jseg(
        0xC4, bytes([0x10]) + bytes(_PROG_AC_BITS) + _PROG_AC_VALS
    )

    # ---- baseline: single interleaved scan
    bp = _BitPack()
    pred = {}
    for cid, zz in mcu_seq:
        diff = zz[0] - pred.get(cid, 0)
        pred[cid] = zz[0]
        s = diff.bit_length() if diff > 0 else (-diff).bit_length()
        bp.emit(*dc_t[s])
        if s:
            bp.emit(diff if diff > 0 else diff + (1 << s) - 1, s)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                bp.emit(*ac_t[0x00])
                break
            while run > 15:
                bp.emit(*ac_t[0xF0])
                run -= 16
            v = zz[k]
            s = v.bit_length() if v > 0 else (-v).bit_length()
            bp.emit(*ac_t[(run << 4) | s])
            bp.emit(v if v > 0 else v + (1 << s) - 1, s)
            k += 1
    sos_base = _jseg(
        0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    ) + bp.flush()
    baseline = (
        b"\xff\xd8" + dqt
        + _jseg(0xC0, sof_body) + dht + sos_base + b"\xff\xd9"
    )

    # ---- progressive scan script
    def sos(comp_ids, ss, se, ah, al, entropy):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _jseg(0xDA, body) + entropy

    scans = sos([1, 2, 3], 0, 0, 0, 1, _scan_dc_first(mcu_seq, dc_t, 1))
    for cid in (1, 2, 3):
        scans += sos([cid], 1, 63, 0, 1, _scan_ac_first(nonint[cid], 1, 63, 1, ac_t))
    scans += sos([1, 2, 3], 0, 0, 1, 0, _scan_dc_refine(mcu_seq, 0))
    for cid in (1, 2, 3):
        scans += sos([cid], 1, 63, 1, 0, _scan_ac_refine(nonint[cid], 1, 63, 0, ac_t))
    progressive = (
        b"\xff\xd8" + dqt
        + _jseg(0xC2, sof_body) + dht + scans + b"\xff\xd9"
    )
    return baseline, progressive


def test_decode_jpeg_progressive_color_420_equals_baseline():
    """Color 4:2:0 progressive: interleaved DC scans (3 components,
    2x2/1x1/1x1 blocks per MCU) + non-interleaved per-component AC
    scans over the ceil(comp/8) geometry — must decode to the same
    RGB bytes as the baseline interleaved encoding of the same
    coefficients."""
    import numpy as np

    w, h = 20, 12  # forces MCU padding blocks Y grid 4x2 vs AC scan 3x2
    yy = np.array(
        [[(x * 11 + y * 7) % 256 for x in range(w)] for y in range(h)], dtype=float
    )
    cw, chh = -(-w // 2), -(-h // 2)
    cb = np.array([[(x * 23) % 256 for x in range(cw)] for _ in range(chh)], dtype=float)
    cr = np.array([[(y * 17) % 256 for _ in range(cw)] for y in range(chh)], dtype=float)
    base_jpg, prog_jpg = _encode_jpeg_color_pair(yy, cb, cr, w, h)
    base = mm.decode_jpeg_pixels(base_jpg)
    prog = mm.decode_jpeg_pixels(prog_jpg)
    assert base[:3] == prog[:3] == (w, h, 3)
    assert base[3] == prog[3]


def test_decode_jpeg_progressive_equals_baseline():
    """A full progressive scan script (DC successive approximation,
    spectral bands, two AC refinement rounds, EOB runs with buffered
    correction bits) must reconstruct the EXACT same coefficients as
    the baseline encoding of the same image — so the decoded pixels
    are bit-identical."""
    w, h = 21, 18  # non-multiple-of-8 + multiple blocks -> EOB runs
    pixels = bytes(((x * 13) ^ (x >> 4) ^ ((x // w) * 29)) % 256 for x in range(w * h))
    base = mm.decode_jpeg_pixels(_encode_jpeg_gray(pixels, w, h))
    prog = mm.decode_jpeg_pixels(_encode_jpeg_gray_progressive(pixels, w, h))
    assert base[:3] == prog[:3] == (w, h, 1)
    assert base[3] == prog[3]


def test_decode_jpeg_progressive_flat_image_eob_runs():
    """A constant image makes every AC band an EOB run spanning all
    blocks (the EOBRUN accumulation path) — decode must still match
    baseline exactly."""
    w, h = 32, 16
    pixels = bytes([77]) * (w * h)
    base = mm.decode_jpeg_pixels(_encode_jpeg_gray(pixels, w, h))
    prog = mm.decode_jpeg_pixels(_encode_jpeg_gray_progressive(pixels, w, h))
    assert base == prog


def test_progressive_jpeg_through_pixel_stats(spark):
    """image_pixel_stats dispatches progressive payloads end to end."""
    from pyspark.sql import Row

    w, h = 16, 8
    pixels = bytes((x * 5) % 256 for x in range(w * h))
    payload = _encode_jpeg_gray_progressive(pixels, w, h)
    media = spark.createDataFrame(
        [Row(media_id=1, modality="image", mime="image/jpeg",
             payload=bytearray(payload), source_uri="f:1")],
        schema=mm.MEDIA_SCHEMA,
    )
    r = mm.image_pixel_stats(media).collect()[0]
    assert (r.width, r.height, r.channels, r.ok) == (w, h, 1, "ok")


def test_decode_jpeg_real_files_and_dispatch(spark):
    import glob
    import os

    candidates = sorted(
        glob.glob(
            "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
            "test/imghdrdata/python.jpg"
        )
    )
    if not candidates or not os.path.exists(candidates[0]):
        import pytest

        pytest.skip("no real JPEG fixtures on this host")
    data = open(candidates[0], "rb").read()
    w, h, ch, px = mm.decode_jpeg_pixels(data)
    assert (w, h) == mm.parse_image_dims(data)
    assert ch == 3 and len(px) == w * h * 3
    # pixel-stats stage dispatches JPEG now
    from pyspark.sql import Row

    media = spark.createDataFrame(
        [Row(media_id=1, modality="image", mime="image/jpeg",
             payload=bytearray(data), source_uri="f:1")],
        schema=mm.MEDIA_SCHEMA,
    )
    r = mm.image_pixel_stats(media).collect()[0]
    assert (r.width, r.height, r.channels, r.ok) == (w, h, 3, "ok")


# --- REAL video frame decode (AVI/MJPEG) -------------------------------------


def _avi_mjpeg(frames_jpeg, w, h, codec=b"MJPG"):
    """Craft a minimal-but-correct AVI container: RIFF(AVI ) with
    hdrl(avih + strl(strh vids/MJPG + strf)) and movi(00dc per frame),
    word-aligned chunk padding included."""
    import struct as st

    def chunk(cid, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cid + st.pack("<I", len(data)) + data + pad

    def lst(ltype, payload):
        return chunk(b"LIST", ltype + payload)

    avih = st.pack("<10I", 33333, 0, 0, 0, len(frames_jpeg), 0, 1, 0, w, h) + bytes(16)
    strh = b"vids" + codec + bytes(48)
    strf = bytes(40)  # BITMAPINFOHEADER placeholder
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames_jpeg))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + st.pack("<I", len(body)) + body


def test_avi_meta_and_frame_extraction():
    w, h = 16, 8
    frames = [
        _encode_jpeg_gray(bytes((x * 3 + i * 11) % 256 for x in range(w * h)), w, h)
        for i in range(7)
    ]
    avi = _avi_mjpeg(frames, w, h)
    meta = mm.parse_avi_meta(avi)
    assert (meta["n_frames"], meta["width"], meta["height"]) == (7, 16, 8)
    assert meta["codec"] == "MJPG" and meta["us_per_frame"] == 33333
    got = list(mm.avi_video_frames(avi))
    assert [i for i, _ in got] == list(range(7))
    # odd-sized JPEG chunks must round-trip exactly through the
    # word-aligned chunk walk
    assert all(bytes(fb) == frames[i] for i, fb in got)
    import pytest

    with pytest.raises(ValueError):
        mm.parse_avi_meta(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        list(mm.avi_video_frames(b"not a riff"))


def test_video_frame_stats_real_decode(spark):
    """video_frame_stats extracts every_n-th MJPEG frame and decodes
    REAL pixels (same values as decoding the frame JPEGs directly);
    non-AVI payloads and H.264-class MP4s land in the err channel."""
    from pyspark.sql import Row

    w, h = 16, 8
    frames = [
        _encode_jpeg_gray(bytes((x * 5 + i * 31) % 256 for x in range(w * h)), w, h)
        for i in range(7)
    ]
    avi = _avi_mjpeg(frames, w, h)
    rows = [
        Row(media_id=1, modality="video", mime="video/x-msvideo",
            payload=bytearray(avi), source_uri="f:1"),
        Row(media_id=2, modality="video", mime="video/mp4",
            payload=bytearray(_mp4()), source_uri="f:2"),
        Row(media_id=3, modality="video", mime="text/plain",
            payload=bytearray(b"definitely not a video"), source_uri="f:3"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.video_frame_stats(media, every_n=3).collect()
    mine = sorted(
        [(r.frame_idx, r.width, r.height, r.channels, r.mean, r.ok)
         for r in out if r.media_id == 1]
    )
    expected = []
    for fi in (0, 3, 6):
        fw, fh, ch, px = mm.decode_image_pixels(frames[fi])
        expected.append((fi, fw, fh, ch, f"{sum(px) / len(px):.6f}", "ok"))
    assert mine == expected
    errs = {r.media_id: r.ok for r in out if r.media_id != 1}
    assert errs[2].startswith("err:") and errs[3].startswith("err:")


def test_synth_fixture_builders_decode_exactly():
    """The deterministic fixture builders (q_px1/q_rz1's oracle basis)
    must round-trip through the REAL decoders to exactly their
    closed-form pixels: solid-gray PNG -> every sample == v; solid-RGB
    GIF -> the palette triple repeated w*h times. This is the
    arithmetic the driver oracle recomputes, so the pin here is
    equality, not tolerance."""
    from electrician_spark.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        synth_gif_solid,
        synth_png_gray,
    )

    for w, h, v in [(1, 1, 0), (4, 3, 255), (8, 5, 129), (13, 2, 7)]:
        W, H, C, px = decode_png_pixels(synth_png_gray(w, h, v))
        assert (W, H, C) == (w, h, 1)
        assert px == bytes([v]) * (w * h)
    for w, h, rgb in [(1, 1, (0, 0, 0)), (5, 4, (10, 200, 33)), (16, 3, (255, 1, 128))]:
        W, H, C, px = decode_gif_pixels(synth_gif_solid(w, h, rgb))
        assert (W, H, C) == (w, h, 3)
        assert px == bytes(rgb) * (w * h)


def test_synth_jpeg_avi_builders_decode_exactly():
    """q_vf1's oracle basis: a DC-only solid-gray JPEG (all-ones quant,
    DC = 8*(v-128) integral) must decode to exactly v in every sample,
    including non-multiple-of-8 dims (padded blocks stay constant),
    and the AVI wrapper must round-trip every frame byte-for-byte."""
    from electrician_spark.multimodal import (
        avi_video_frames,
        decode_image_pixels,
        parse_avi_meta,
        synth_avi_mjpeg,
        synth_jpeg_gray_solid,
    )

    for w, h, v in [(8, 8, 0), (8, 8, 255), (16, 8, 128), (13, 9, 7), (9, 25, 129)]:
        W, H, C, px = decode_image_pixels(synth_jpeg_gray_solid(w, h, v))
        assert (W, H, C) == (w, h, 1)
        assert px == bytes([v]) * (w * h)
    frames = [synth_jpeg_gray_solid(16, 8, (i * 31) % 256) for i in range(5)]
    avi = synth_avi_mjpeg(frames, 16, 8)
    assert parse_avi_meta(avi)["n_frames"] == 5
    got = list(avi_video_frames(avi))
    assert [bytes(fb) for _, fb in got] == frames


def test_audio_quality_stats_closed_form(spark):
    # 2048 silent + 2048 full-scale samples, frame=1024: exactly half
    # the windows are silent, half the samples clipped; the loud half
    # is a constant full-scale level → peak 0 dBFS, overall RMS
    # 20·log10(1/sqrt(2)) = −3.010300 dBFS.
    mixed = [0] * 2048 + [32767] * 2048
    blob_mixed, _ = _wav(samples=mixed)
    blob_silent, _ = _wav(samples=[0] * 4096)
    blob8, _ = _wav(width=1, samples=[127] * 256)
    media = spark.createDataFrame(
        [
            (1, bytearray(blob_mixed)),
            (2, bytearray(blob_silent)),
            (3, bytearray(blob8)),
            (4, bytearray(b"JUNK")),
        ],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in mm.audio_quality_stats(media, frame=1024).collect()
    }
    m = out[1]
    assert m.n_samples == 4096 and m.ok == "ok"
    assert m.clip_ratio == "0.500000" and m.silence_ratio == "0.500000"
    assert m.peak_dbfs == "0.000000" and m.rms_dbfs == "-3.010300"
    s = out[2]
    assert s.silence_ratio == "1.000000" and s.clip_ratio == "0.000000"
    assert s.rms_dbfs is None and s.peak_dbfs is None
    b8 = out[3]  # 8-bit full scale is 127 — clip detection respects width
    assert b8.clip_ratio == "1.000000" and b8.peak_dbfs == "0.000000"
    assert out[4].ok.startswith("err:") and out[4].n_samples is None


def test_audio_quality_stats_32bit_no_int64_wrap(spark):
    # 32-bit PCM near full scale: one squared sample is ~4.6e18, so a
    # 1024-sample frame sum wrapped int64 (negative rms → math.sqrt
    # raise → valid WAVs in the err channel). Squares now accumulate
    # in float64: a constant full-scale clip is exactly 0 dBFS.
    full = (1 << 31) - 1
    blob, _ = _wav(width=4, samples=[full] * 4096)
    out = mm.audio_quality_stats(
        spark.createDataFrame(
            [(1, bytearray(blob))], "media_id long, payload binary"
        ),
        frame=1024,
    ).collect()[0]
    assert out.ok == "ok" and out.n_samples == 4096
    assert out.clip_ratio == "1.000000" and out.silence_ratio == "0.000000"
    assert out.peak_dbfs == "0.000000" and out.rms_dbfs == "0.000000"


def test_h264_video_payloads_degrade_to_err_channel(spark):
    """Real-crawl video is overwhelmingly H.264; a pure-stdlib H.264
    decoder is out of scope, so the ATTESTED policy is graceful
    degradation: H.264-class frame payloads flow through the same
    video_frame_stats plan as MJPEG and land per-frame in the err
    channel (census-able frame_idx preserved), while MJPEG rows in the
    same batch decode to real pixels. Non-RIFF containers (an MP4)
    err at the container level. Nothing fabricates pixels, nothing
    fails the task."""
    from electrician_spark.multimodal import synth_avi_mjpeg, synth_jpeg_gray_solid

    mjpeg = synth_avi_mjpeg([synth_jpeg_gray_solid(8, 8, 90)] * 3, 8, 8)
    # H.264-class chunks: Annex-B NAL units (start code + SPS/IDR
    # NAL types) in the 00dc stream; fourcc patched MJPG -> H264 so
    # the container is honest about its codec.
    nals = [
        b"\x00\x00\x00\x01\x67\x42\x00\x1e" + bytes(16),
        b"\x00\x00\x00\x01\x65\x88\x84\x00" + bytes(32),
    ]
    h264 = synth_avi_mjpeg(nals, 16, 16).replace(b"vidsMJPG", b"vidsH264")
    assert b"H264" in h264
    mp4 = (
        b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2"
        + b"\x00\x00\x00\x08moov"
    )
    media = spark.createDataFrame(
        [
            (1, bytearray(mjpeg)),
            (2, bytearray(h264)),
            (3, bytearray(mp4)),
        ],
        "media_id long, payload binary",
    )
    rows = mm.video_frame_stats(media, every_n=1).collect()
    by = {}
    for r in rows:
        by.setdefault(r.media_id, []).append(r)
    # MJPEG: all three frames decode with real pixel means
    assert [r.ok for r in by[1]] == ["ok"] * 3
    assert all(r.mean == "90.000000" for r in by[1])
    # H.264: frames are extracted (the movi walk is container-level)
    # but each one errs at decode — census keeps the frame count
    assert sorted(r.frame_idx for r in by[2]) == [0, 1]
    assert all(r.ok == "err:ValueError" and r.mean is None for r in by[2])
    # MP4: container-level reject, one err row, frame_idx -1
    assert len(by[3]) == 1 and by[3][0].frame_idx == -1
    assert by[3][0].ok == "err:ValueError"
