"""Ogg container triage (RFC 3533) with Opus (RFC 7845) and Vorbis
(public xiph.org spec) identification headers: stream counts, codec,
channels/rate and exact duration from page granule positions — WITHOUT
decoding. Completes the audio-triage family next to MP3/AAC/WAV/FLAC.

Grammar: 'OggS' capture pattern, version 0, header-type flags
(continuation/BOS/EOS), 64-bit LE granule position, serial, sequence,
CRC, segment lacing table. The first packet of a BOS page identifies
the codec: 'OpusHead' (channels, pre-skip, original rate) or
'\\x01vorbis' (channels, rate). Duration comes from the LAST page's
granule position: Opus granules tick at 48 kHz regardless of input
rate minus pre-skip; Vorbis granules tick at the stream sample rate.

Spark shape: per-blob walks, embarrassingly parallel, zero shuffle.

Reference note: the reference engine has no audio path (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine


@quarantine("ogg")
def parse_ogg(data: bytes) -> dict:
    """Page walk → codec ('opus'|'vorbis'|'unknown'), n_pages,
    n_streams (distinct serials), channels, sample_rate, duration_us
    (from the final granule; None when the codec is unknown or the
    granule is unset). Raises ValueError on non-Ogg or truncated
    pages."""
    if data[:4] != b"OggS":
        raise ValueError("Ogg: missing OggS capture pattern")
    pos = 0
    n_pages = 0
    serials: set[int] = set()
    codec = "unknown"
    channels = None
    sample_rate = None
    pre_skip = 0
    last_granule: int | None = None
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg: lost page sync")
        version = data[pos + 4]
        if version != 0:
            raise ValueError(f"Ogg: unsupported stream structure version {version}")
        header_type = data[pos + 5]
        granule = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
        serial = struct.unpack("<I", data[pos + 14 : pos + 18])[0]
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("Ogg: truncated lacing table")
        body_len = sum(lacing)
        body = data[pos + 27 + nsegs : pos + 27 + nsegs + body_len]
        if len(body) < body_len:
            raise ValueError("Ogg: page body overruns the stream")
        n_pages += 1
        serials.add(serial)
        if header_type & 0x02:  # BOS: first packet identifies the codec
            if body.startswith(b"OpusHead") and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                pre_skip = struct.unpack("<H", body[10:12])[0]
                sample_rate = struct.unpack("<I", body[12:16])[0]
            elif body.startswith(b"\x01vorbis") and len(body) >= 30:
                codec = "vorbis"
                channels = body[11]
                sample_rate = struct.unpack("<I", body[12:16])[0]
        if granule >= 0:
            last_granule = granule
        pos += 27 + nsegs + body_len
    if n_pages == 0:
        raise ValueError("Ogg: no pages found")
    duration_us = None
    if last_granule is not None:
        if codec == "opus":
            duration_us = max(last_granule - pre_skip, 0) * 1_000_000 // 48_000
        elif codec == "vorbis" and sample_rate:
            duration_us = last_granule * 1_000_000 // sample_rate
    return {
        "codec": codec,
        "n_pages": n_pages,
        "n_streams": len(serials),
        "channels": channels,
        "sample_rate": sample_rate,
        "duration_us": duration_us,
    }


# ---------------------------------------------------------------- writer
def _page(
    serial: int, seq: int, granule: int, body: bytes, header_type: int = 0
) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC (not validated by the triage walk)
        + bytes([len(segs)])
        + bytes(segs)
        + body
    )


def to_ogg_bytes(
    codec: str,
    channels: int,
    sample_rate: int,
    final_granule: int,
    n_audio_pages: int = 3,
    pre_skip: int = 312,
) -> bytes:
    """Fixture/export half: BOS identification page + deterministic
    audio pages whose last granule encodes the planted duration."""
    serial = 0x1234
    if codec == "opus":
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + b"\x00\x00\x00"
        )
    elif codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + b"\x00" * 12  # bitrate max/nominal/min
            + b"\x66"  # blocksizes
            + b"\x01"  # framing bit
        )
    else:
        ident = b"????head"
    # granule -1 on the header page (RFC 3533: no packet finishes here)
    out = bytearray(_page(serial, 0, -1, ident, 0x02))
    for k in range(n_audio_pages):
        gran = final_granule if k == n_audio_pages - 1 else (k + 1) * 960
        flags = 0x04 if k == n_audio_pages - 1 else 0
        body = bytes(1 + (k + j) % 250 for j in range(64))
        out += _page(serial, k + 1, gran, body, flags)
    return bytes(out)
