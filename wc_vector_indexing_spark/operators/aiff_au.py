"""AIFF/AIFC and Sun AU audio triage — the two remaining uncompressed
audio containers a crawl corpus serves beside WAV (Mac-era archives
ship AIFF; Unix-era archives ship .au/.snd). Joins the header-triage
family (operators/flac.py, ogg.py, mp3.py, webp.py): channel/rate/
depth/duration WITHOUT decoding samples; PCM decode stays with the
multimodal seam, same posture as the rest of the family.

Grammars (public specs: Apple AIFF-1.3 / AIFF-C, Sun audio header):

- AIFF is an EA-IFF-85 FORM: ``FORM`` + u32 size + ``AIFF``|``AIFC``,
  then chunks (fourcc + u32 size, big-endian, odd sizes pad a byte).
  ``COMM`` carries channels (u16), sample frames (u32), bits (u16),
  and the sample rate as an 80-bit IEEE 754 EXTENDED float (the
  format's famous quirk — 15-bit biased exponent + explicit-integer-
  bit 64-bit mantissa), plus a compression fourcc in the AIFC form.
- AU is 24+ bytes: ``.snd`` magic, u32 data offset / size / encoding /
  rate / channels, all big-endian; the annotation field (offset > 24)
  is ignored by players and by us.

Spark shape: constant-time per-blob header walk, zero shuffle.

Reference note: the reference engine decodes no audio (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine

_AU_ENCODINGS = {
    1: "ulaw8", 2: "pcm8", 3: "pcm16", 4: "pcm24", 5: "pcm32",
    6: "float32", 7: "float64", 27: "alaw8",
}
_AU_BITS = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 6: 32, 7: 64, 27: 8}


def _read_extended(raw: bytes) -> float:
    """80-bit IEEE 754 extended (big-endian) → float: 1 sign bit,
    15-bit exponent (bias 16383), 64-bit mantissa with an EXPLICIT
    integer bit."""
    if len(raw) != 10:
        raise ValueError("AIFF: extended float needs 10 bytes")
    (se,) = struct.unpack(">H", raw[:2])
    (mant,) = struct.unpack(">Q", raw[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("AIFF: non-finite sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended(value: float) -> bytes:
    """float → 80-bit extended; exact for every sample rate that fits
    64 mantissa bits (all real ones do)."""
    if value == 0:
        return bytes(10)
    if value < 0 or value != value or value in (float("inf"),):
        raise ValueError("sample rate must be finite and positive")
    exp = 16383 + 63
    mant = value
    while mant >= 2.0 ** 64:
        mant /= 2.0
        exp += 1
    while mant < 2.0 ** 63:
        mant *= 2.0
        exp -= 1
    return struct.pack(">H", exp) + struct.pack(">Q", int(mant))


@quarantine("aiff")
def parse_aiff(data: bytes) -> dict:
    """→ variant ('aiff'|'aifc'), channels, sample_frames, bits,
    sample_rate (int Hz), compression (fourcc, 'NONE' for plain
    AIFF), duration_ms, has_data (an SSND chunk exists). Raises
    ValueError for non-AIFF bytes."""
    if len(data) < 12 or data[:4] != b"FORM":
        raise ValueError("AIFF: missing FORM header")
    form_type = data[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError(f"AIFF: FORM type {form_type!r} is not AIFF/AIFC")
    pos, comm, has_data = 12, None, False
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"AIFF: chunk {fourcc!r} overruns the file")
        if fourcc == b"COMM":
            if size < 18:
                raise ValueError("AIFF: COMM chunk too short")
            channels, frames, bits = struct.unpack(">HIH", body[:8])
            rate = _read_extended(body[8:18])
            if form_type == b"AIFC":
                if size < 22:
                    raise ValueError("AIFC: COMM missing compression type")
                compression = body[18:22].decode("ascii", "replace")
            else:
                compression = "NONE"
            comm = (channels, frames, bits, rate, compression)
        elif fourcc == b"SSND":
            has_data = True
        pos += 8 + size + (size & 1)  # odd chunks pad one byte
    if comm is None:
        raise ValueError("AIFF: no COMM chunk")
    channels, frames, bits, rate, compression = comm
    if rate <= 0:
        raise ValueError("AIFF: non-positive sample rate")
    if int(round(rate)) < 1:
        # A crafted 80-bit COMM rate in (0, 0.5) passes the <=0 gate but
        # rounds to 0 Hz — the duration division below would raise
        # ZeroDivisionError, which is outside the @quarantine contract.
        raise ValueError("AIFF: sub-1Hz sample rate")
    return {
        "variant": "aifc" if form_type == b"AIFC" else "aiff",
        "channels": channels,
        "sample_frames": frames,
        "bits": bits,
        "sample_rate": int(round(rate)),
        "compression": compression,
        "duration_ms": int(frames * 1000 // int(round(rate))),
        "has_data": has_data,
    }


@quarantine("au")
def parse_au(data: bytes) -> dict:
    """→ encoding (name), bits, sample_rate, channels, n_frames,
    duration_ms. ``n_frames``/duration are NULL (None) when the header
    declares the streaming unknown-size sentinel 0xFFFFFFFF. Raises
    ValueError for non-AU bytes."""
    if len(data) < 24 or data[:4] != b".snd":
        raise ValueError("AU: missing .snd magic")
    offset, size, enc, rate, channels = struct.unpack(">IIIII", data[4:24])
    if offset < 24:
        raise ValueError("AU: data offset inside the header")
    if enc not in _AU_ENCODINGS:
        raise ValueError(f"AU: unknown encoding {enc}")
    if rate == 0 or channels == 0:
        raise ValueError("AU: zero rate/channels")
    bits = _AU_BITS[enc]
    if size == 0xFFFFFFFF:
        n_frames = duration_ms = None
    else:
        frame_bytes = max(1, bits // 8) * channels
        n_frames = size // frame_bytes
        duration_ms = int(n_frames * 1000 // rate)
    return {
        "encoding": _AU_ENCODINGS[enc],
        "bits": bits,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
    }


# --------------------------------------------------------------- writers

def to_aiff_bytes(
    channels: int, sample_frames: int, bits: int, sample_rate: float,
    compression: str | None = None,
) -> bytes:
    """Fixture half: a valid FORM/AIFF (or AIFC when ``compression``
    is given) with a COMM chunk and a deterministic-filler SSND chunk
    sized for the declared frames."""
    if compression is None:
        form_type, comm_body = b"AIFF", b""
    else:
        if len(compression) != 4:
            raise ValueError("compression must be a 4-char fourcc")
        # AIFC: fourcc + pascal-string name (empty, padded even)
        form_type = b"AIFC"
        comm_body = compression.encode("ascii") + b"\x00\x00"
    comm = (
        struct.pack(">HIH", channels, sample_frames, bits)
        + _write_extended(float(sample_rate))
        + comm_body
    )
    data_len = sample_frames * channels * max(1, bits // 8)
    ssnd = struct.pack(">II", 0, 0) + bytes(min(data_len, 64))
    chunks = b""
    for fourcc, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += fourcc + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


def to_au_bytes(
    encoding: str, sample_rate: int, channels: int, n_frames: int,
) -> bytes:
    """Fixture half: a valid AU header + deterministic filler sized
    for the declared frames."""
    enc = {v: k for k, v in _AU_ENCODINGS.items()}[encoding]
    frame_bytes = max(1, _AU_BITS[enc] // 8) * channels
    size = n_frames * frame_bytes
    return (
        b".snd" + struct.pack(">IIIII", 24, size, enc, sample_rate, channels)
        + bytes(min(size, 64))
    )
