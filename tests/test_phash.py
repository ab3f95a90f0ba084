"""Perceptual image hashing (multimodal.image_phash) + banded hamming
near-dup (dedup.hamming_pairs) — pinned against closed-form DCT sign
patterns of constant and half-plane images.

The analytic expectations (independent of the implementation):
- solid image: every AC coefficient is mathematically 0 (rounded to
  exactly 0.0 at 6 dp), DC > 0 → only bit 0 set → phash = 1.
- top-light / bottom-dark half split: nonzero coeffs only at
  (u odd, v=0) with signs +,−,+,− for u=1,3,5,7 (the 1-D DCT of a
  half step: Σ_{y<16} cos((2y+1)uπ/64) = sin(uπ/2) / (2 sin(uπ/64))),
  so bits {0, 8, 40} → 1 + 2^8 + 2^40. Dark-top flips the signs →
  bits {0, 24, 56}. Left/right splits transpose to (u=0, v odd):
  {0,1,5} → 35 light-left, {0,3,7} → 137 dark-left.
"""

import numpy as np

from electrician_spark import multimodal as mm
from electrician_spark.operators import dedup

H_SOLID = 1
H_TB_LIGHT = 1 + 2**8 + 2**40
H_TB_DARK = 1 + 2**24 + 2**56
H_LR_LIGHT = 1 + 2**1 + 2**5
H_LR_DARK = 1 + 2**3 + 2**7


def _phash_bytes(payload: bytes) -> int:
    w, h, ch, px = mm.decode_image_pixels(payload)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
    return mm.phash_of_pixels(arr)


def test_solid_images_hash_to_dc_only_across_codecs():
    assert _phash_bytes(mm.synth_png_gray(32, 32, 77)) == H_SOLID
    assert _phash_bytes(mm.synth_png_gray(64, 96, 200)) == H_SOLID
    assert _phash_bytes(mm.synth_gif_solid(32, 32, (140, 140, 140))) == H_SOLID
    assert _phash_bytes(mm.synth_jpeg_gray_solid(64, 64, 90)) == H_SOLID
    # non-gray solid GIF: luma is constant → still DC-only
    assert _phash_bytes(mm.synth_gif_solid(64, 32, (200, 30, 90))) == H_SOLID


def test_half_plane_splits_match_analytic_sign_pattern():
    assert _phash_bytes(mm.synth_png_gray_split(32, 32, 180, 60, True)) == H_TB_LIGHT
    assert _phash_bytes(mm.synth_png_gray_split(32, 32, 60, 180, True)) == H_TB_DARK
    assert _phash_bytes(mm.synth_png_gray_split(32, 32, 180, 60, False)) == H_LR_LIGHT
    assert _phash_bytes(mm.synth_png_gray_split(32, 32, 60, 180, False)) == H_LR_DARK


def test_phash_is_resize_invariant_for_clean_splits():
    # the property that makes pHash a dedup key: re-encoded / resized
    # copies collide. Multiple-of-32 sizes keep the box resample exact.
    for dims in ((64, 64), (96, 64), (64, 96), (96, 96)):
        assert _phash_bytes(
            mm.synth_png_gray_split(dims[0], dims[1], 150, 40, True)
        ) == H_TB_LIGHT
    # and different gray LEVELS with the same structure also collide
    assert _phash_bytes(mm.synth_png_gray_split(64, 64, 250, 10, True)) == H_TB_LIGHT


def test_image_phash_dataframe_and_error_channel(spark):
    rows = [
        (1, bytearray(mm.synth_png_gray(32, 32, 50))),
        (2, bytearray(mm.synth_png_gray_split(64, 64, 180, 60, True))),
        (3, bytearray(b"not an image")),
        (4, None),
    ]
    out = {
        r.media_id: (r.phash, r.ok)
        for r in mm.image_phash(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert out[1] == (H_SOLID, "ok")
    assert out[2] == (H_TB_LIGHT, "ok")
    assert out[3][0] is None and out[3][1].startswith("err:")
    assert out[4][0] is None and out[4][1].startswith("err:")


def test_hamming_pairs_on_phash_table(spark):
    # distances between the closed-form hashes: same family 0,
    # solid↔any split 2, split↔split 4 — max_hamming=3 keeps exactly
    # the solid↔split and same-family edges.
    sig = spark.createDataFrame(
        [
            (1, H_SOLID),
            (2, H_TB_LIGHT),
            (3, H_LR_LIGHT),
            (4, H_SOLID),  # exact dup of 1
            (5, H_TB_LIGHT),  # exact dup of 2
        ],
        "media_id long, phash long",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.hamming_pairs(
            sig, "media_id", "phash", max_hamming=3
        ).collect()
    }
    assert pairs[(1, 4)] == 0 and pairs[(2, 5)] == 0
    assert pairs[(1, 2)] == 2 and pairs[(1, 3)] == 2
    assert (2, 3) not in pairs  # distance 4 > 3
    assert pairs[(3, 4)] == 2 and pairs[(2, 4)] == 2 and pairs[(4, 5)] == 2
    assert len(pairs) == 8  # (1,5) and (3,5) also at 2


def test_hamming_pairs_negative_signatures(spark):
    # bit-63 signatures are negative longs (two's complement) — the
    # arithmetic-shift-and-mask banding must still bucket them.
    a = (1 << 63) - (1 << 64)  # only bit 63 set, as signed
    sig = spark.createDataFrame(
        [(1, a), (2, a), (3, 0)], "media_id long, phash long"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.hamming_pairs(sig, "media_id", "phash", max_hamming=1).collect()
    }
    assert pairs == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def _png_gray_alpha(w: int, h: int, rows_v, alpha: int = 255) -> bytes:
    """Color-type-4 (gray+alpha) PNG: per-row gray values from
    ``rows_v`` (int → solid), every alpha = ``alpha``."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    if isinstance(rows_v, int):
        rows_v = [rows_v] * h
    ihdr = struct.pack(">II5B", w, h, 8, 4, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([v, alpha]) * w for v in rows_v
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_gray_alpha_png_hashes_like_gray():
    # color type 4 (gray+alpha): luma is plane 0 — the RGB formula
    # previously indexed plane 2 and raised IndexError, silently
    # dropping valid GA PNGs into the image_phash err channel.
    assert _phash_bytes(_png_gray_alpha(32, 32, 77)) == H_SOLID
    split = [180 if y < 16 else 60 for y in range(32)]
    assert _phash_bytes(_png_gray_alpha(32, 32, split)) == H_TB_LIGHT


def test_gray_alpha_png_through_image_phash_df(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_png_gray_alpha(32, 32, 50)))],
        "media_id long, payload binary",
    )
    rows = mm.image_phash(df).collect()
    assert len(rows) == 1 and rows[0]["ok"] == "ok"
    assert rows[0]["phash"] == H_SOLID


# --- aHash / dHash (r8: one-decode-pass hash family) -------------------------

AH_TB = 0x00000000FFFFFFFF            # top-light: rows 0-3 above the mean
AH_LR = 0x0F0F0F0F0F0F0F0F            # left-light: cols 0-3 above the mean
DH_LR = 0x1818181818181818            # left-light: falling edges at c=3,4


def test_ahash_dhash_closed_forms():
    solid_png = mm.synth_png_gray(32, 32, 77)
    solid_gif = mm.synth_gif_solid(8, 8, (10, 10, 10))
    for payload in (solid_png, solid_gif):
        w, h, ch, px = mm.decode_image_pixels(payload)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
        # constant image: no cell exceeds the mean, no gradient
        assert mm.ahash_of_pixels(arr) == 0
        assert mm.dhash_of_pixels(arr) == 0

    def arr_of(payload):
        w, h, ch, px = mm.decode_image_pixels(payload)
        return np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)

    tb = arr_of(mm.synth_png_gray_split(32, 32, 180, 60, True))
    lr = arr_of(mm.synth_png_gray_split(32, 32, 180, 60, False))
    assert mm.ahash_of_pixels(tb) == AH_TB
    assert mm.ahash_of_pixels(lr) == AH_LR
    # horizontal-constant rows: dHash sees no gradient top/bottom —
    # the edge structure aHash can't separate, dHash pins exactly
    assert mm.dhash_of_pixels(tb) == 0
    # left-light rows resample to [180*4, 120, 60*4]: falling edges at
    # columns 3 and 4 in every row
    assert mm.dhash_of_pixels(lr) == DH_LR


def test_ahash_dhash_resize_invariance():
    for dims in [(32, 32), (64, 64), (96, 32)]:
        a = mm.synth_png_gray_split(dims[0], dims[1], 150, 40, False)
        w, h, ch, px = mm.decode_image_pixels(a)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
        assert mm.ahash_of_pixels(arr) == AH_LR
        assert mm.dhash_of_pixels(arr) == DH_LR


def test_image_perceptual_hashes_dataframe(spark):
    rows = [
        (1, bytearray(mm.synth_png_gray(32, 32, 50))),
        (2, bytearray(mm.synth_png_gray_split(64, 64, 180, 60, False))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in mm.image_perceptual_hashes(df).collect()}
    assert out[1].ok == "ok" and (out[1].phash, out[1].ahash, out[1].dhash) == (
        H_SOLID, 0, 0
    )
    assert (out[2].ahash, out[2].dhash) == (AH_LR, DH_LR)
    # one decode pass must agree with the standalone phash op
    assert out[2].phash == _phash_bytes(bytes(rows[1][1]))
    assert out[3].ok.startswith("err:")
    assert out[3].phash is None and out[3].ahash is None and out[3].dhash is None
