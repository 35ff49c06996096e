"""Audio DSP operators (operators/audio.py): spectral features recover
planted frequencies from synthesized WAVs; the Haitsma-Kalker-style
band-energy fingerprint is volume-invariant and separates unrelated
clips; the Hamming pair join finds re-leveled re-encodes."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.audio import (
    fingerprint64,
    signal_features,
)


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from float samples in [-1, 1]."""
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def sine(freq: float, seconds: float = 0.5, rate: int = 8000, amp: float = 0.8):
    t = np.arange(int(seconds * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def _decode(data: bytes):
    from wc_vector_indexing_spark.operators.multimodal import decode_audio

    return decode_audio(data)


def test_dominant_frequency_recovered():
    for freq in (440.0, 1200.0, 3000.0):
        samples, rate = _decode(make_wav(sine(freq)))
        feats = signal_features(samples, rate)
        assert feats["dominant_hz"] == pytest.approx(freq, abs=4.0)
        # a pure tone concentrates: centroid near the tone, tiny bandwidth
        assert feats["spectral_centroid_hz"] == pytest.approx(freq, rel=0.05)
        assert feats["spectral_bandwidth_hz"] < freq * 0.2


def test_duration_rms_zcr():
    samples, rate = _decode(make_wav(sine(500.0, seconds=0.25)))
    feats = signal_features(samples, rate)
    assert feats["duration_s"] == pytest.approx(0.25, abs=1e-3)
    # full-scale-normalized sine: RMS = 1/sqrt(2)
    assert feats["rms"] == pytest.approx(1 / np.sqrt(2), abs=0.01)
    # a 500 Hz tone at 8 kHz crosses zero 1000x per second = rate/8
    assert feats["zcr"] == pytest.approx(2 * 500.0 / 8000.0, abs=0.01)


def test_silence_is_all_zero_features():
    samples, rate = _decode(make_wav(np.zeros(4000)))
    feats = signal_features(samples, rate)
    assert feats["rms"] == 0.0 and feats["dominant_hz"] == 0.0


def test_fingerprint_volume_invariant():
    """The Haitsma-Kalker property: band-energy COMPARISONS cancel any
    gain factor, so a re-leveled copy fingerprints identically."""
    # amplitudes sum < 1: the loud version must NOT clip in the int16
    # encode, or it really is a different (harmonic-distorted) signal
    mix = sine(440, amp=0.5) + sine(1800, amp=0.3) + sine(3300, amp=0.15)
    loud, _ = _decode(make_wav(mix, rate=8000))
    quiet, _ = _decode(make_wav(mix * 0.1, rate=8000))
    assert fingerprint64(loud, 8000) == fingerprint64(quiet, 8000)


def test_fingerprint_separates_unrelated_clips():
    a, _ = _decode(make_wav(sine(440, amp=0.5) + sine(1800, amp=0.4)))
    b, _ = _decode(make_wav(sine(700, amp=0.5) + sine(2500, amp=0.4)))
    d = bin(fingerprint64(a, 8000) ^ fingerprint64(b, 8000)).count("1")
    assert d > 12  # far apart in Hamming space


def test_audio_features_spark(spark):
    from wc_vector_indexing_spark.operators.audio import audio_features

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(make_wav(sine(440)))),
            (2, "audio", bytearray(make_wav(sine(2000)))),
        ],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in audio_features(media).collect()}
    assert got[1].dominant_hz == pytest.approx(440.0, abs=4.0)
    assert got[2].dominant_hz == pytest.approx(2000.0, abs=4.0)
    assert got[1].duration_s == pytest.approx(0.5, abs=1e-3)


def test_audio_near_pairs_finds_releveled_copy(spark):
    from wc_vector_indexing_spark.operators.audio import audio_near_pairs

    mix = sine(440, amp=0.5) + sine(1500, amp=0.35)
    other = sine(900, amp=0.5) + sine(3100, amp=0.35)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(make_wav(mix))),
            (2, "audio", bytearray(make_wav(mix * 0.2))),   # re-leveled copy
            (3, "audio", bytearray(make_wav(other))),       # unrelated
        ],
        "media_id long, kind string, content binary",
    )
    pairs = {(r.media_a, r.media_b): r.hamming
             for r in audio_near_pairs(media, max_hamming=4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert not any(3 in p for p in pairs)


def test_audio_overlap_pairs_finds_excerpt(spark):
    """Partial-copy case: a 1-second excerpt cut from a 3-second
    recording shares all its window fingerprints with the source;
    unrelated audio shares none. Content varies per window so windows
    are distinctive (three alternating tone mixes)."""
    from wc_vector_indexing_spark.operators.audio import audio_overlap_pairs

    rate = 8000
    secs = []
    for f1, f2 in ((500, 1700), (800, 2600), (1100, 3400)):
        secs.append(sine(f1, seconds=1.0, amp=0.5) + sine(f2, seconds=1.0, amp=0.35))
    full = np.concatenate(secs)
    excerpt = full[rate : 2 * rate]            # the middle second
    other = sine(650, seconds=2.0, amp=0.5) + sine(2100, seconds=2.0, amp=0.35)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(make_wav(full))),
            (2, "audio", bytearray(make_wav(excerpt * 0.3))),   # re-leveled excerpt
            (3, "audio", bytearray(make_wav(other))),
        ],
        "media_id long, kind string, content binary",
    )
    got = {(r.media_a, r.media_b): r.overlap
           for r in audio_overlap_pairs(media, min_overlap=0.5).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == 1.0   # every excerpt window found in the source


def test_overlap_denominator_uses_df_capped_windows(spark):
    """Round-6 advisory regression: clip sizes must be measured over the
    SAME df-capped window population the shared counts use. Clips 1-4
    here are half boilerplate (the same jingle window in every clip,
    capped at max_window_df=3) and half distinctive; clip 5 is a pure
    excerpt of clip 1's distinctive half. With the pre-cap denominator
    the jingle windows inflate min(|A|,|B|) and the excerpt can't reach
    min_overlap=1.0; with the capped denominator it scores exactly 1.0."""
    from wc_vector_indexing_spark.operators.audio import audio_overlap_pairs

    jingle = sine(700, seconds=0.5, amp=0.5) + sine(2300, seconds=0.5, amp=0.35)
    uniq = {
        i: sine(400 + 90 * i, seconds=0.5, amp=0.5)
        + sine(1500 + 140 * i, seconds=0.5, amp=0.35)
        for i in range(1, 6)
    }
    rows = []
    for i in range(1, 5):  # jingle + own distinctive window
        rows.append((i, "audio", bytearray(make_wav(
            np.concatenate([jingle, uniq[i]])
        ))))
    # clip 5: ONLY clip 1's distinctive window (full containment)
    rows.append((5, "audio", bytearray(make_wav(uniq[1] * 0.4))))
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    got = {(r.media_a, r.media_b): r.overlap
           for r in audio_overlap_pairs(
               media, min_overlap=1.0, max_window_df=3).collect()}
    assert got == {(1, 5): 1.0}


def test_overlap_near_finds_cross_codec_excerpt(spark):
    """The Hamming-tolerant overlap join must catch an MP3 re-encode of
    an excerpt cut from a WAV recording — the case where exact window
    equality breaks (codec quantization moves each window fingerprint
    1-3 bits; measured against operators/mp3_decode). Unrelated audio
    must stay out."""
    from wc_vector_indexing_spark.operators.audio import (
        audio_overlap_pairs_near,
    )
    from wc_vector_indexing_spark.operators.mp3_decode import encode_mp3

    rate = 32000
    secs = []
    for f1, f2 in ((500, 1700), (800, 2600), (1100, 3400)):
        secs.append(sine(f1, 1.0, rate, 0.5) + sine(f2, 1.0, rate, 0.35))
    full = np.concatenate(secs)
    excerpt = full[rate:2 * rate] * 0.3
    other = sine(650, 2.0, rate, 0.5) + sine(2100, 2.0, rate, 0.35)

    def mp3(x):
        pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        return encode_mp3(pcm, rate, bitrate_kbps=160)

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(make_wav(full, rate))),
            (2, "audio", bytearray(mp3(excerpt))),     # cross-codec excerpt
            (3, "audio", bytearray(make_wav(other, rate))),
        ],
        "media_id long, kind string, content binary",
    )
    got = {(r.media_a, r.media_b): r.overlap
           for r in audio_overlap_pairs_near(media, min_overlap=0.5).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 0.5
