"""FLAC STREAMINFO triage (the public xiph.org / RFC 9639 format):
sample rate, channels, bit depth and exact duration from the mandatory
first metadata block — WITHOUT decoding (subframe/rice decode stays
behind the ``decode_audio`` seam). Completes the audio-triage family:
MP3 (operators/mp3.py), AAC (operators/aac.py), WAV (stdlib), FLAC.

Grammar: 'fLaC' magic, then metadata blocks (1-byte type+last flag,
24-bit big-endian length); STREAMINFO (type 0, 34 bytes) packs
min/max block+frame sizes, a 20-bit sample rate, 3-bit channels-1,
5-bit bits-per-sample-1 and a 36-bit total-samples count.

Spark shape: per-blob constant-time header read, zero shuffle.

Reference note: the reference engine has no audio path (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine


@quarantine("flac")
def parse_flac_streaminfo(data: bytes) -> dict:
    """fLaC header walk → sample_rate, channels, bits_per_sample,
    total_samples, duration_us (exact integer µs; 0 total_samples is
    the spec's 'unknown' and yields NULL duration). Raises ValueError
    on non-FLAC input or a malformed block chain."""
    if data[:4] != b"fLaC":
        raise ValueError("FLAC: missing fLaC magic")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("FLAC: metadata block overruns the stream")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: no STREAMINFO block")
    # bytes 10..17 pack rate(20) | chan-1(3) | bps-1(5) | total(36)
    packed = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x07) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError("FLAC: sample rate 0 is invalid")
    duration_us = total * 1_000_000 // sample_rate if total else None
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bps,
        "total_samples": total,
        "duration_us": duration_us,
    }


def to_flac_bytes(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    with_vorbis_comment: bool = False,
) -> bytes:
    """Fixture/export half: magic + STREAMINFO (+ an optional VORBIS_
    COMMENT block the walk must step over) + a token frame byte. The
    parser recovers every field bit-for-bit."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + b"\x00" * 6  # min/max frame size (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    out = bytearray(b"fLaC")
    if with_vorbis_comment:
        out += bytes([0x00]) + len(si).to_bytes(3, "big") + si
        vc = b"\x07\x00\x00\x00fixture\x00\x00\x00\x00"
        out += bytes([0x80 | 0x04]) + len(vc).to_bytes(3, "big") + vc
    else:
        out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    out += b"\xff\xf8"  # first frame sync (never parsed here)
    return bytes(out)
