"""Property-based tests (hypothesis) for the pure kernels behind the
pandas UDFs — the analytic-identity layer of the test strategy
(SURVEY §5.2). These run Python-side (no Spark job per example): the
pandas_udf wrappers expose the underlying function via ``.func``, and
the Haar/threshold kernels are module-level numpy functions."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from electrician_spark.functions import codecs, dsp

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


def arrays(min_len=0, max_len=64):
    return st.lists(finite, min_size=min_len, max_size=max_len)


# -- wave binary codec -------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(arrays())
def test_wave_codec_roundtrip(re):
    im = [x / 2 for x in re]
    blob = codecs.wave_encode.func(pd.Series([re]), pd.Series([im])).iloc[0]
    out = codecs.wave_decode.func(pd.Series([blob]))
    np.testing.assert_allclose(out["re"].iloc[0], re, rtol=0, atol=0)
    np.testing.assert_allclose(out["im"].iloc[0], im, rtol=0, atol=0)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_wave_decode_never_crashes_on_garbage(blob):
    out = codecs.wave_decode.func(pd.Series([blob]))
    row = out.iloc[0]
    # either decoded cleanly (only if it happens to be well-formed) or NULL
    if row["re"] is not None:
        n = len(row["re"])
        assert len(blob) >= 4 + 16 * n


@settings(max_examples=100, deadline=None)
@given(arrays(min_len=1))
def test_wave_encode_length_exact(re):
    blob = codecs.wave_encode.func(pd.Series([re]), pd.Series([re])).iloc[0]
    assert len(blob) == 4 + 16 * len(re)


# -- Haar wavelet ------------------------------------------------------------


def pow2_arrays():
    return st.integers(min_value=0, max_value=6).flatmap(
        lambda k: st.lists(finite, min_size=2**k, max_size=2**k)
    )


@settings(max_examples=200, deadline=None)
@given(pow2_arrays())
def test_haar_roundtrip_identity(xs):
    x = np.asarray(xs, dtype=np.complex128)
    back = dsp._haar_inv(dsp._haar_fwd(x))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(pow2_arrays())
def test_haar_preserves_mean(xs):
    # coefficient 0 of the full Haar transform is the global average
    x = np.asarray(xs, dtype=np.complex128)
    fwd = dsp._haar_fwd(x)
    np.testing.assert_allclose(fwd[0], x.mean(), rtol=1e-9, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(pow2_arrays(), st.floats(min_value=0, max_value=10, allow_nan=False))
def test_denoise_only_zeroes_coefficients(xs, thresh):
    x = np.asarray(xs, dtype=np.complex128)
    y = dsp._threshold(x, thresh)
    for a, b in zip(x, y):
        assert b == a or b == 0


# -- FFT identities ----------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(arrays(min_len=1, max_len=64))
def test_parseval(re):
    # Σ|x|² == (1/N)·Σ|X|² — time-domain energy equals scaled spectral sum
    e_time = dsp.total_energy.func(pd.Series([re]), pd.Series([[0.0] * len(re)])).iloc[0]
    spec = dsp.power_spectrum.func(pd.Series([re]), pd.Series([[0.0] * len(re)])).iloc[0]
    np.testing.assert_allclose(e_time, sum(spec) / len(re), rtol=1e-6, atol=1e-6)


# -- compression codecs ------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096), st.sampled_from(["deflate", "gzip", "bz2", "xz"]))
def test_compression_roundtrip(payload, codec):
    comp, decomp = codecs._codec_fns(codec)
    assert decomp(comp(payload)) == payload


# -- BPE incremental trainer -------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcd", min_size=1, max_size=8),
                  st.integers(min_value=1, max_value=50)),
        min_size=0, max_size=40,
    ),
    st.integers(min_value=0, max_value=60),
)
def test_bpe_incremental_equals_reference(words, num_merges):
    from electrician_spark.functions import tokenizer as bpe

    vocab: dict = {}
    for w, c in words:
        k = tuple(w) + (bpe.END_OF_WORD,)
        vocab[k] = vocab.get(k, 0) + c
    assert bpe._merge_loop(dict(vocab), num_merges) == \
        bpe._train_bpe_merges_reference(dict(vocab), num_merges)


# -- PNG decode (all filters, crafted corpus) --------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=3),  # ctype selector
    st.data(),
)
def test_png_decode_inverts_any_filter_sequence(w, h, ct_sel, data):
    from electrician_spark import multimodal as mm
    from tests.test_multimodal import _full_png

    ctype = [0, 2, 4, 6][ct_sel]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * channels,
                           max_size=w * h * channels))
    )
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    png = _full_png(w, h, pixels, ctype=ctype, filters=filters)
    gw, gh, ch, got = mm.decode_png_pixels(png)
    assert (gw, gh, ch) == (w, h, channels)
    assert got == pixels


# -- GIF LZW roundtrip -------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=2000))
def test_gif_lzw_roundtrip_random_streams(indices):
    from electrician_spark import multimodal as mm
    from tests.test_multimodal import _lzw_encode

    data = _lzw_encode(2, bytes(indices))
    out = mm._lzw_decode(2, data, len(indices))
    assert bytes(out) == bytes(indices)


# --- perceptual hash (multimodal.phash_of_pixels) ---------------------------


def _rand_img(seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    h, w, ch = int(rng.integers(8, 70)), int(rng.integers(8, 70)), int(rng.integers(1, 4))
    if ch == 2:
        ch = 3
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_phash_deterministic_and_in_range(seed):
    from electrician_spark import multimodal as mm

    arr = _rand_img(seed)
    a, b = mm.phash_of_pixels(arr), mm.phash_of_pixels(arr.copy())
    assert a == b  # bit-stable on identical pixels
    assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_phash_gray_rgb_equivalence(seed):
    # an RGB image with r=g=b has EXACTLY the single-channel hash:
    # luma = (299g+587g+114g)/1000 = g with no float error (1000·g is
    # exact in f64 and divides back exactly), so the whole DCT
    # pipeline sees identical input.
    import numpy as np

    from electrician_spark import multimodal as mm

    gray = _rand_img(seed)[:, :, :1]
    rgb = np.repeat(gray, 3, axis=2)
    assert mm.phash_of_pixels(gray) == mm.phash_of_pixels(rgb)


# -- audio spectral fingerprint ----------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=2, max_size=512),
    st.integers(min_value=2, max_value=8),
)
def test_afp_scale_invariance_and_range(samples, k):
    """Scaling PCM by an integer factor never changes the fingerprint
    (energy fractions are scale-free), and the value always fits
    signed 64-bit."""
    from electrician_spark.multimodal import afp_of_samples

    base = afp_of_samples(samples, nch=1)
    scaled = afp_of_samples([s * k for s in samples], nch=1)
    assert base == scaled
    assert -(1 << 63) <= base < (1 << 63)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-30000, max_value=30000), min_size=2, max_size=256))
def test_afp_channel_duplication_and_dc(samples):
    from electrician_spark.multimodal import afp_of_samples

    mono = afp_of_samples(samples, nch=1)
    stereo = afp_of_samples([s for s in samples for _ in (0, 1)], nch=2)
    assert mono == stereo
    shifted = afp_of_samples([s + 100 for s in samples], nch=1)
    assert mono == shifted


# -- WordPiece greedy segmentation -------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcd", min_size=1, max_size=24))
def test_wordpiece_segmentation_total_and_lossless(word):
    """Over a vocab containing the full alphabet (plain + ##), greedy
    segmentation never UNKs and always reproduces the word."""
    from electrician_spark.functions.tokenizer import wordpiece_word

    vocab = {c for c in "abcd"} | {"##" + c for c in "abcd"} | {"ab", "##cd", "abc"}
    ps = wordpiece_word(word, vocab)
    assert ps != ["[UNK]"]
    assert "".join(p[2:] if p.startswith("##") else p for p in ps) == word
    # greedy: the first piece is the longest vocab prefix
    for end in range(len(word), len(ps[0]), -1):
        assert word[:end] not in vocab


# -- T5 span corruption kernel (via the Python reference arithmetic) ---------


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=1, max_value=60))
def test_span_corrupt_md5_arithmetic_bounds(did, n):
    """The masking arithmetic (shared Spark/DuckDB md5 identity) keeps
    every span inside the document and masks a sane fraction."""
    import hashlib

    noise, m = 0.15, 3
    p_thr = int(noise / m * (1 << 32))
    width = 2 * m - 1

    def h32(i, tag):
        return int(hashlib.md5(f"0:{did}:{i}:{tag}".encode()).hexdigest()[:8], 16)

    starts = [i for i in range(n) if h32(i, "s") < p_thr]
    masked = set()
    for s in starts:
        ln = 1 + h32(s, "l") % width
        assert 1 <= ln <= 2 * m - 1
        masked.update(range(s, min(s + ln, n)))
    assert all(0 <= i < n for i in masked)
    assert len(masked) <= min(n, len(starts) * (2 * m - 1))


# -- aHash / dHash / binary-quantization kernels (r8) --------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_ahash_dhash_deterministic_and_in_64bit_range(seed):
    from electrician_spark import multimodal as mm

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    a1, a2 = mm.ahash_of_pixels(arr), mm.ahash_of_pixels(arr.copy())
    d1, d2 = mm.dhash_of_pixels(arr), mm.dhash_of_pixels(arr.copy())
    assert a1 == a2 and d1 == d2
    for v in (a1, d1):
        assert -(1 << 63) <= v < (1 << 63)
    # gray+alpha uses plane 0 only: adding an alpha plane changes nothing
    ga = np.stack([arr[:, :, 0], np.full((16, 16), 255, np.uint8)], axis=2)
    gray = arr[:, :, :1]
    assert mm.ahash_of_pixels(ga) == mm.ahash_of_pixels(gray)
    assert mm.dhash_of_pixels(ga) == mm.dhash_of_pixels(gray)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="0123456789", min_size=12, max_size=18))
def test_luhn_check_digit_construction(body):
    """For ANY digit body, exactly one check digit makes the full
    number Luhn-valid — the defining property of the checksum."""

    def py_luhn(ds):
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    digits = [int(c) for c in body]
    valid = [c for c in range(10) if py_luhn(digits + [c])]
    assert len(valid) == 1


# -- BPE encode kernel (greedy lowest-rank merge loop) ------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcd", min_size=1, max_size=24))
def test_bpe_encode_word_lossless_and_terminal(word):
    """encode_word under any learned-looking merge table: pieces always
    concatenate back to word + '</w>' (merging never loses or invents
    characters), and the terminal state is a true fixpoint — no
    adjacent piece pair remains in the rank table."""
    from electrician_spark.functions.tokenizer import encode_word

    ranks = {
        ("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2, ("a", "a"): 3,
        ("d", "</w>"): 4, ("b", "b"): 5, ("cd", "</w>"): 6, ("ab", "ab"): 7,
    }
    ps = encode_word(word, ranks)
    assert "".join(ps) == word + "</w>"
    for a, b in zip(ps, ps[1:]):
        assert (a, b) not in ranks  # greedy loop ran to exhaustion


# -- dyadic-weight exactness (the q_fc1 determinism contract) -----------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-64, max_value=64), min_size=1, max_size=200),
    st.randoms(use_true_random=False),
)
def test_dyadic_weight_sums_order_invariant(units, rng):
    """linear_scores' contract: weights that are multiples of 2^-6 sum
    EXACTLY in float64 regardless of summation order (every partial sum
    is a dyadic rational well inside the 53-bit mantissa), so the
    keep/drop boundary cannot flip between engines or partitionings."""
    ws = [u / 64.0 for u in units]
    forward = 0.0
    for w in ws:
        forward += w
    shuffled = list(ws)
    rng.shuffle(shuffled)
    backward = 0.0
    for w in reversed(shuffled):
        backward += w
    assert forward == backward == sum(units) / 64.0
