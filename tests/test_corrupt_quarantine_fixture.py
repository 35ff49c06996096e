"""Planted-truth guards for the corrupt_media_quarantine registry
entry: its DuckDB oracle assumes every corrupt slot RAISES and every
clean slot DECODES for all 17 pattern variants. If the JPEG encoder's
output ever shrinks/shifts so a 60% cut lands after the scan, or the
PNG/WAV writers change shape, the oracle would go stale silently —
this pins the assumption per variant, without Spark."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg import encode_baseline
from wc_vector_indexing_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)
from wc_vector_indexing_spark.operators.png import decode_png

OK_ERRORS = (ValueError, NotImplementedError)


def _img(pat: int) -> np.ndarray:
    yy, xx = np.mgrid[0:16, 0:16]
    return ((yy * (3 + pat) + xx * (5 + pat)) % 256).astype(np.uint8)


def _png(img: np.ndarray) -> bytes:
    h, w = img.shape

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _wav(seed: int) -> bytes:
    t = np.arange(400)
    pcm = (np.sin(2 * np.pi * (220 + 10 * seed) * t / 8000)
           * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("pat", range(17))
def test_clean_slots_decode(pat):
    img = _img(pat)
    from wc_vector_indexing_spark.operators.jpeg import decode_jpeg

    assert decode_jpeg(encode_baseline(img)).shape == (16, 16)
    assert np.array_equal(decode_png(_png(img)), img)
    samples, rate = decode_audio(_wav(pat))
    assert rate == 8000 and samples.shape == (400, 1)


@pytest.mark.parametrize("pat", range(17))
def test_corrupt_slots_raise(pat):
    img = _img(pat)
    j = encode_baseline(img)
    with pytest.raises(OK_ERRORS):
        decode_image(j[: int(len(j) * 0.6)])
    p = bytearray(_png(img))
    p[p.find(b"IDAT") + 8] ^= 0x80
    with pytest.raises(OK_ERRORS):
        decode_image(bytes(p))
    with pytest.raises(OK_ERRORS):
        decode_audio(_wav(pat)[:25])
