"""EXIF parse/strip (multimodal.py): synthetic APP1/TIFF fixtures in
both byte orders (inline + offset values, Exif sub-IFD, GPS
rationals), metadata scrub with pixel-identity pin, and the
mapInPandas census with its error channel."""

import struct

import pytest

from electrician_spark import multimodal as mm


def _tiff(bo_char: str, gps: bool = True) -> bytes:
    """Minimal TIFF blob: IFD0 (Make offset-ASCII, Model inline-ish,
    Orientation SHORT, DateTime ASCII, Exif + GPS pointers), Exif IFD
    (DateTimeOriginal, ISO, dims), GPS IFD (lat/lon rationals)."""
    bo = "<" if bo_char == "II" else ">"

    def entry(tag, typ, cnt, val: bytes) -> bytes:
        pad = val + b"\x00" * (4 - len(val)) if len(val) <= 4 else val
        return struct.pack(bo + "HHI", tag, typ, cnt) + pad[:4]

    # layout: header(8) IFD0 exifIFD gpsIFD heap
    make = b"ACME Cameras\x00"          # 13 bytes → offset value
    dt = b"2021:05:04 10:20:30\x00"     # 20 bytes → offset
    dto = b"2021:05:04 10:00:00\x00"
    n0 = 6 if gps else 5
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 12 * 4 + 4
    gps_off = exif_off + exif_size
    gps_size = 2 + 12 * 4 + 4 if gps else 0
    heap = gps_off + gps_size

    heap_bytes = b""
    make_off = heap + len(heap_bytes)
    heap_bytes += make
    dt_off = heap + len(heap_bytes)
    heap_bytes += dt
    dto_off = heap + len(heap_bytes)
    heap_bytes += dto
    lat_off = heap + len(heap_bytes)
    # 37° 46' 29.64" N  (37.774900)
    heap_bytes += struct.pack(bo + "IIIIII", 37, 1, 46, 1, 2964, 100)
    lon_off = heap + len(heap_bytes)
    # 122° 25' 9.84" W (-122.419400)
    heap_bytes += struct.pack(bo + "IIIIII", 122, 1, 25, 1, 984, 100)

    e0 = [
        entry(0x010F, 2, len(make), struct.pack(bo + "I", make_off)),
        entry(0x0110, 2, 4, b"X1\x00\x00"),  # inline ASCII
        entry(0x0112, 3, 1, struct.pack(bo + "H", 6)),
        entry(0x0132, 2, len(dt), struct.pack(bo + "I", dt_off)),
        entry(0x8769, 4, 1, struct.pack(bo + "I", exif_off)),
    ]
    if gps:
        e0.append(entry(0x8825, 4, 1, struct.pack(bo + "I", gps_off)))
    ifd0 = struct.pack(bo + "H", len(e0)) + b"".join(sorted(e0)) + b"\x00" * 4

    ee = [
        entry(0x9003, 2, len(dto), struct.pack(bo + "I", dto_off)),
        entry(0x8827, 3, 1, struct.pack(bo + "H", 200)),
        entry(0xA002, 4, 1, struct.pack(bo + "I", 640)),
        entry(0xA003, 3, 1, struct.pack(bo + "H", 480)),
    ]
    exif = struct.pack(bo + "H", len(ee)) + b"".join(sorted(ee)) + b"\x00" * 4

    parts = [
        struct.pack(bo + "2sHI", bo_char.encode(), 42, ifd0_off),
        ifd0,
        exif,
    ]
    if gps:
        ge = [
            entry(0x0001, 2, 2, b"N\x00\x00\x00"),
            entry(0x0002, 5, 3, struct.pack(bo + "I", lat_off)),
            entry(0x0003, 2, 2, b"W\x00\x00\x00"),
            entry(0x0004, 5, 3, struct.pack(bo + "I", lon_off)),
        ]
        parts.append(
            struct.pack(bo + "H", len(ge)) + b"".join(sorted(ge)) + b"\x00" * 4
        )
    parts.append(heap_bytes)
    return b"".join(parts)


def _jpeg_with_exif(bo_char: str = "II", gps: bool = True) -> bytes:
    base = mm.synth_jpeg_gray_solid(8, 8, 128)
    body = b"Exif\x00\x00" + _tiff(bo_char, gps=gps)
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return base[:2] + app1 + base[2:]


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_parse_exif_both_byte_orders(bo):
    meta = mm.parse_exif(_jpeg_with_exif(bo))
    assert meta["make"] == "ACME Cameras"
    assert meta["model"] == "X1"
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2021:05:04 10:20:30"
    assert meta["datetime_original"] == "2021:05:04 10:00:00"
    assert meta["iso"] == 200
    assert (meta["exif_width"], meta["exif_height"]) == (640, 480)
    assert meta["gps_lat"] == 37.7749
    assert meta["gps_lon"] == -122.4194


def test_parse_exif_absent_and_corrupt():
    plain = mm.synth_jpeg_gray_solid(8, 8, 10)
    assert all(v is None for v in mm.parse_exif(plain).values())
    no_gps = mm.parse_exif(_jpeg_with_exif(gps=False))
    assert no_gps["gps_lat"] is None and no_gps["make"] == "ACME Cameras"
    with pytest.raises(ValueError):
        mm.parse_exif(b"\x89PNG not a jpeg")
    # truncated TIFF: bad IFD offset must raise, not wrap around
    body = b"Exif\x00\x00" + b"II" + struct.pack("<HI", 42, 9999)
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    base = mm.synth_jpeg_gray_solid(8, 8, 10)
    with pytest.raises(ValueError):
        mm.parse_exif(base[:2] + app1 + base[2:])


def test_strip_jpeg_metadata_pixels_identical():
    tagged = _jpeg_with_exif()
    stripped = mm.strip_jpeg_metadata(tagged)
    assert all(v is None for v in mm.parse_exif(stripped).values())
    assert mm.decode_jpeg_pixels(stripped) == mm.decode_jpeg_pixels(tagged)
    assert mm.parse_image_dims(stripped) == (8, 8)
    # idempotent; plain files pass through byte-identical
    assert mm.strip_jpeg_metadata(stripped) == stripped


def test_exif_metadata_census(spark):
    rows = [
        (1, bytearray(_jpeg_with_exif("II"))),
        (2, bytearray(_jpeg_with_exif("MM", gps=False))),
        (3, bytearray(mm.synth_jpeg_gray_solid(8, 8, 50))),
        (4, bytearray(mm.synth_png_gray(4, 4, 7))),  # not a JPEG → err
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in mm.exif_metadata(df).collect()}
    assert got[1]["ok"] == "ok" and got[1]["has_gps"] is True
    assert got[1]["gps_lat"] == 37.7749 and got[1]["orientation"] == 6
    assert got[2]["ok"] == "ok" and got[2]["has_gps"] is False
    assert got[2]["make"] == "ACME Cameras"
    assert got[3]["ok"] == "ok" and got[3]["make"] is None
    assert got[4]["ok"].startswith("err:") and got[4]["has_gps"] is None


def test_strip_png_metadata():
    import struct as _s
    import zlib as _z

    def chunk(typ, data):
        return _s.pack(">I", len(data)) + typ + data + _s.pack(
            ">I", _z.crc32(typ + data) & 0xFFFFFFFF
        )

    base = mm.synth_png_gray(4, 4, 77)
    # splice tEXt + eXIf chunks after IHDR (8 sig + 25 IHDR bytes)
    head, tail = base[:33], base[33:]
    tagged = head + chunk(b"tEXt", b"Author\x00someone") + chunk(
        b"eXIf", b"II*\x00\x08\x00\x00\x00\x00\x00"
    ) + tail
    stripped = mm.strip_png_metadata(tagged)
    assert stripped == base  # byte-identical to the clean original
    assert mm.decode_png_pixels(stripped) == mm.decode_png_pixels(tagged)
    assert mm.strip_png_metadata(stripped) == stripped  # idempotent
    with pytest.raises(ValueError):
        mm.strip_png_metadata(b"GIF89a not png")
    with pytest.raises(ValueError):
        mm.strip_png_metadata(tagged[:40])  # torn

    # dispatcher routes by container
    assert mm.strip_image_metadata(tagged) == base
    jpeg = mm.synth_jpeg_gray_solid(8, 8, 5)
    assert mm.strip_image_metadata(jpeg) == mm.strip_jpeg_metadata(jpeg)
    gif = mm.synth_gif_solid(2, 2, (1, 2, 3))
    assert mm.strip_image_metadata(gif) == gif


def test_strip_gif_metadata():
    base = mm.synth_gif_solid(3, 3, (10, 20, 30))
    # splice a comment + application extension before the image data;
    # GIF header = 6 sig + 7 LSD; synth uses a global color table
    packed = base[10]
    hdr_end = 13 + 3 * (2 << (packed & 0x07))
    comment = b"\x21\xfe\x07made by\x00"
    app = b"\x21\xff\x0bXMP DataXMP" + b"\x03abc" + b"\x00"
    tagged = base[:hdr_end] + comment + app + base[hdr_end:]
    stripped = mm.strip_gif_metadata(tagged)
    assert stripped == base
    assert mm.decode_gif_pixels(stripped) == mm.decode_gif_pixels(tagged)
    assert mm.strip_gif_metadata(stripped) == stripped  # idempotent
    assert mm.strip_image_metadata(tagged) == base  # dispatcher routes
    with pytest.raises(ValueError):
        mm.strip_gif_metadata(b"\x89PNG not gif")
    with pytest.raises(ValueError):
        mm.strip_gif_metadata(tagged[:-2])  # trailer gone
