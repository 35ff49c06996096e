"""AIFF/AIFC + Sun AU triage: writer/parser roundtrips, the 80-bit
extended-float sample rate, odd-chunk padding, and AU sentinel/error
paths."""

from __future__ import annotations

import struct

import pytest

from wc_vector_indexing_spark.operators.aiff_au import (
    _read_extended,
    _write_extended,
    parse_aiff,
    parse_au,
    to_aiff_bytes,
    to_au_bytes,
)


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_extended_float_roundtrip(rate):
    assert _read_extended(_write_extended(float(rate))) == float(rate)


def test_extended_float_known_encoding():
    # 44100 = 0x400E AC44 0000 0000 0000 — the canonical spec example
    assert _write_extended(44100.0) == bytes.fromhex("400eac4400000000" "0000")
    assert _read_extended(bytes.fromhex("400eac440000000000" "00")) == 44100.0


def test_extended_float_rejects_nonfinite():
    with pytest.raises(ValueError):
        _read_extended(b"\x7f\xff" + bytes(8))  # exp all-ones


def test_aiff_roundtrip():
    got = parse_aiff(to_aiff_bytes(2, 44100 * 3, 16, 44100))
    assert got == {
        "variant": "aiff", "channels": 2, "sample_frames": 132300,
        "bits": 16, "sample_rate": 44100, "compression": "NONE",
        "duration_ms": 3000, "has_data": True,
    }


def test_aifc_compression_fourcc():
    got = parse_aiff(to_aiff_bytes(1, 8000, 8, 8000, compression="ulaw"))
    assert got["variant"] == "aifc" and got["compression"] == "ulaw"


def test_aiff_odd_chunk_padding():
    # an odd-sized unknown chunk before COMM must not derail the walk
    inner = parse_aiff.__wrapped__ if hasattr(parse_aiff, "__wrapped__") else parse_aiff
    base = to_aiff_bytes(1, 100, 16, 8000)
    odd = b"ANNO" + struct.pack(">I", 3) + b"abc" + b"\x00"  # padded
    patched = base[:12] + odd + base[12:]
    patched = patched[:4] + struct.pack(">I", len(patched) - 8) + patched[8:]
    assert inner(patched)["sample_frames"] == 100


def test_aiff_errors():
    with pytest.raises(ValueError):
        parse_aiff(b"RIFF" + bytes(20))
    with pytest.raises(ValueError):
        parse_aiff(b"FORM" + struct.pack(">I", 4) + b"WAVE")
    with pytest.raises(ValueError):  # no COMM
        parse_aiff(b"FORM" + struct.pack(">I", 4) + b"AIFF")


def test_aiff_sub_1hz_rate_is_value_error_not_zero_division():
    # A COMM 80-bit rate in (0, 0.5) passes the <=0 gate but rounds to
    # 0 Hz; the duration division must not escape @quarantine as
    # ZeroDivisionError. Exponent 0x3FFD (bias 16383 → 2^-2) with a
    # normalized mantissa encodes 0.25 Hz.
    base = to_aiff_bytes(1, 100, 16, 8000)
    comm_at = base.index(b"COMM")
    rate_at = comm_at + 8 + 8  # fourcc + size + (chans, frames, bits)
    crafted = (
        base[:rate_at]
        + struct.pack(">H", 0x3FFD)
        + struct.pack(">Q", 1 << 63)
        + base[rate_at + 10:]
    )
    with pytest.raises(ValueError, match="sub-1Hz"):
        parse_aiff(crafted)


def test_au_roundtrip():
    got = parse_au(to_au_bytes("pcm16", 16000, 2, 16000))
    assert got == {
        "encoding": "pcm16", "bits": 16, "sample_rate": 16000,
        "channels": 2, "n_frames": 16000, "duration_ms": 1000,
    }


def test_au_unknown_size_sentinel():
    raw = bytearray(to_au_bytes("ulaw8", 8000, 1, 100))
    raw[8:12] = b"\xff\xff\xff\xff"
    got = parse_au(bytes(raw))
    assert got["n_frames"] is None and got["duration_ms"] is None
    assert got["encoding"] == "ulaw8"


def test_au_errors():
    with pytest.raises(ValueError):
        parse_au(b"snd." + bytes(20))
    bad = bytearray(to_au_bytes("pcm16", 8000, 1, 10))
    bad[12:16] = struct.pack(">I", 99)  # unknown encoding
    with pytest.raises(ValueError):
        parse_au(bytes(bad))
    bad2 = bytearray(to_au_bytes("pcm16", 8000, 1, 10))
    bad2[4:8] = struct.pack(">I", 8)  # offset inside header
    with pytest.raises(ValueError):
        parse_au(bytes(bad2))
