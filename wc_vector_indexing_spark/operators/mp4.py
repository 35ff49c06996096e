"""MP4 / ISOBMFF (ISO 14496-12) box-structure triage WITHOUT decoding:
container walk for the format that actually carries most crawl video.
Yields the movie-level duration (mvhd timescale/duration), per-track
kind + dimensions (tkhd) and sample-description codec fourccs (stsd:
avc1/hev1/mp4a/…) — everything ingest needs to cost a video corpus
before routing bytes to the transcode seam (operators/video.py
``decode_video``). Same posture as operators/mp3.py / aac.py / h264.py
for the elementary-stream formats.

Everything here is the public box grammar: 32-bit size + fourcc
headers, size==1 ⇒ 64-bit largesize, size==0 ⇒ to-end-of-file,
version 0/1 field widths in mvhd/tkhd, 16.16 fixed-point dimensions.

Spark shape: per-blob walks, embarrassingly parallel, zero shuffle.

Reference note: the reference engine has no video path (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"moof", b"traf", b"udta",
}


def _walk(data: bytes, pos: int, end: int, depth: int = 0):
    """Yield (fourcc, body_start, body_end, depth) over a box run."""
    while pos + 8 <= end:
        size, fourcc = struct.unpack(">I4s", data[pos : pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize header")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4: box {fourcc!r} overruns the file")
        yield fourcc, body, pos + size, depth
        if fourcc in _CONTAINERS:
            yield from _walk(data, body, pos + size, depth + 1)
        pos += size


@quarantine("mp4")
def parse_mp4(data: bytes) -> dict:
    """Box walk → brand, duration_us (mvhd), n_tracks, per-track codec
    fourccs (sorted, comma-joined), video width/height (first video
    tkhd). Raises ValueError for non-ISOBMFF or truncated input."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("MP4: no ftyp box at start")
    brand = data[8:12].decode("latin-1")
    duration_us = None
    n_tracks = 0
    codecs: list[str] = []
    width = height = None
    for fourcc, body, box_end, depth in _walk(data, 0, len(data)):
        if fourcc == b"mvhd":
            ver = data[body]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[body + 20 : body + 32])
            else:
                ts, dur = struct.unpack(">II", data[body + 12 : body + 20])
            if ts == 0:
                raise ValueError("MP4: mvhd timescale is zero")
            duration_us = dur * 1_000_000 // ts
        elif fourcc == b"trak":
            n_tracks += 1
        elif fourcc == b"tkhd":
            ver = data[body]
            # width/height are the LAST 8 bytes, 16.16 fixed point
            w, h = struct.unpack(">II", data[box_end - 8 : box_end])
            if w and h and width is None:
                width, height = w >> 16, h >> 16
        elif fourcc == b"stsd":
            n_entries = struct.unpack(">I", data[body + 4 : body + 8])[0]
            p = body + 8
            for _ in range(n_entries):
                if p + 8 > box_end:
                    raise ValueError("MP4: stsd entry overruns box")
                esize, efourcc = struct.unpack(">I4s", data[p : p + 8])
                codecs.append(efourcc.decode("latin-1"))
                p += max(esize, 8)
    if duration_us is None:
        raise ValueError("MP4: no mvhd box (not a movie file)")
    return {
        "brand": brand,
        "duration_us": duration_us,
        "n_tracks": n_tracks,
        "codecs": ",".join(sorted(codecs)),
        "width": width,
        "height": height,
    }


# ---------------------------------------------------------------- writer
def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), fourcc) + body


def to_mp4_bytes(
    duration_ms: int,
    timescale: int = 1000,
    width: int = 0,
    height: int = 0,
    codecs: tuple[str, ...] = ("avc1",),
    version1: bool = False,
) -> bytes:
    """Fixture/export half: a structurally valid (decode-free) ISOBMFF
    skeleton — ftyp + moov(mvhd + one trak per codec with tkhd/mdia/
    minf/stbl/stsd) + a small mdat. parse_mp4 recovers every planted
    parameter, including the v1 64-bit mvhd layout."""
    dur = duration_ms * timescale // 1000
    if version1:
        mvhd = _box(
            b"mvhd",
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + struct.pack(">IQ", timescale, dur)
            + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", timescale, dur)
            + b"\x00" * 80,
        )
    traks = b""
    for i, codec in enumerate(codecs):
        is_video = i == 0 and width and height
        tkhd_body = b"\x00" * 4 + b"\x00" * 72 + struct.pack(
            ">II",
            (width << 16) if is_video else 0,
            (height << 16) if is_video else 0,
        )
        stsd = _box(
            b"stsd",
            b"\x00" * 4 + struct.pack(">I", 1)
            + _box(codec.encode("latin-1"), b"\x00" * 20),
        )
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", minf)
        traks += _box(b"trak", _box(b"tkhd", tkhd_body) + mdia)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", bytes(range(48)))
    return ftyp + moov + mdat
