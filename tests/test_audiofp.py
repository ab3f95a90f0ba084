"""Audio spectral fingerprint (multimodal.afp_of_samples /
audio_fingerprint): closed-form single-tone hashes, the documented
invariances (amplitude, phase, DC offset, channel duplication), the
signed-BIGINT bit-63 convention, the error channel, and the
hamming_pairs near-dup composition that completes the cross-modal
near-dup set (SimHash text / pHash image / this for audio)."""

import math

import pytest

from electrician_spark import multimodal as mm
from electrician_spark.operators import dedup

RATE = 8000
N = 4096
USABLE = N // 2  # rfft bins minus the dropped DC bin


def _tone(bin_idx: int, amp: int = 20000, phase: float = 0.0, offset: int = 0):
    """Integer PCM sine landing exactly on FFT bin ``bin_idx`` (zero
    leakage up to quantization, which the 6dp rounding collapses)."""
    f = bin_idx * RATE / N
    return [
        int(round(amp * math.sin(2 * math.pi * f * k / RATE + phase))) + offset
        for k in range(N)
    ]


def band_of(bin_idx: int, n_bands: int = 64) -> int:
    return (bin_idx - 1) * n_bands // USABLE


def signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def test_single_tone_closed_form():
    for bin_idx in (512, 1536):
        got = mm.afp_of_samples(_tone(bin_idx), nch=1)
        assert got == 1 << band_of(bin_idx)


def test_two_tone_two_bits():
    a, b = _tone(512, amp=12000), _tone(1536, amp=12000)
    mixed = [x + y for x, y in zip(a, b)]
    assert mm.afp_of_samples(mixed, nch=1) == (1 << band_of(512)) | (
        1 << band_of(1536)
    )


def test_amplitude_phase_dc_invariance():
    base = mm.afp_of_samples(_tone(512, amp=20000), nch=1)
    assert mm.afp_of_samples(_tone(512, amp=2000), nch=1) == base
    assert mm.afp_of_samples(_tone(512, phase=math.pi / 2), nch=1) == base
    assert mm.afp_of_samples(_tone(512, amp=20000, offset=500), nch=1) == base


def test_stereo_duplicate_equals_mono():
    mono = _tone(512)
    stereo = [s for s in mono for _ in (0, 1)]
    assert mm.afp_of_samples(stereo, nch=2) == mm.afp_of_samples(mono, nch=1)


def test_bit63_signed_convention():
    bin_idx = 2017  # (2017-1)*64//2048 == 63: top band
    assert band_of(bin_idx) == 63
    assert mm.afp_of_samples(_tone(bin_idx), nch=1) == signed64(1 << 63)


def test_silent_and_short_clips():
    assert mm.afp_of_samples([0] * N, nch=1) == 0
    with pytest.raises(ValueError):
        mm.afp_of_samples([1], nch=1)
    with pytest.raises(ValueError):
        mm.afp_of_samples(_tone(512), nch=1, n_bands=65)


def _wav(samples, rate=RATE, nch=1):
    import io
    import struct as st
    import wave as wv

    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(st.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_fingerprint_df_and_near_dup(spark):
    rows = [
        (0, _wav(_tone(512, amp=20000))),        # tone A loud
        (1, _wav(_tone(512, amp=2000))),         # tone A quiet  -> dup of 0
        (2, _wav(_tone(1536))),                  # tone B        -> distinct
        (3, _wav(_tone(512), nch=1)),            # tone A again  -> dup of 0,1
        (4, b"not a wav"),                       # error channel
        (5, None),                               # error channel
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = mm.audio_fingerprint(df)
    got = {r.media_id: (r.afp, r.ok) for r in sig.collect()}
    a_bit, b_bit = 1 << band_of(512), 1 << band_of(1536)
    assert got[0] == (a_bit, "ok") and got[1] == (a_bit, "ok")
    assert got[2] == (b_bit, "ok") and got[3] == (a_bit, "ok")
    assert got[4][0] is None and got[4][1].startswith("err:")
    assert got[5][1].startswith("err:")

    ok = sig.filter("ok = 'ok'").select("media_id", "afp")
    pairs = dedup.hamming_pairs(ok, "media_id", "afp", max_hamming=0)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got_pairs == {(0, 1), (0, 3), (1, 3)}
    # tone A vs tone B differ in exactly the two distinguishing bits
    wide = dedup.hamming_pairs(ok, "media_id", "afp", max_hamming=2)
    dist = {(r.id_a, r.id_b): r.hamming for r in wide.collect()}
    assert dist[(0, 2)] == 2 and dist[(2, 3)] == 2
