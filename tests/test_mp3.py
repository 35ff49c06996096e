"""MP3 frame-header parsing (operators/mp3.py): writer/parser
roundtrip over the ISO 11172-3 tables, ID3v2 tag skipping, resync
tolerance, VBR detection, and the sniff_format routing — headers
only, decode stays behind the decode_audio seam."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.mp3 import (
    parse_mp3_headers,
    to_mp3_bytes,
)


@pytest.mark.parametrize(
    "nf,kbps,sr",
    [(10, 128, 44100), (25, 320, 48000), (1, 32, 32000), (7, 160, 44100)],
)
def test_roundtrip_cbr(nf, kbps, sr):
    meta = parse_mp3_headers(to_mp3_bytes(nf, kbps, sr))
    assert meta["n_frames"] == nf
    assert meta["avg_bitrate_kbps"] == kbps
    assert meta["sample_rate"] == sr
    assert meta["duration_us"] == nf * 1152 * 1_000_000 // sr
    assert meta["vbr"] is False


def test_id3v2_prologue_skipped():
    plain = parse_mp3_headers(to_mp3_bytes(12, 192, 44100))
    tagged = parse_mp3_headers(
        to_mp3_bytes(12, 192, 44100, id3_comment=b"x" * 300)
    )
    assert tagged == plain


def test_vbr_detected():
    data = to_mp3_bytes(5, 128, 44100) + to_mp3_bytes(5, 320, 44100)
    meta = parse_mp3_headers(data)
    assert meta["n_frames"] == 10
    assert meta["vbr"] is True
    assert meta["avg_bitrate_kbps"] == (5 * 128 + 5 * 320) // 10


def test_resync_gap_tolerated_large_garbage_stops():
    base = to_mp3_bytes(4, 128, 44100)
    # 2 stray bytes between frames: the walk resyncs
    frames = [base[i : i + len(base) // 4] for i in range(0, len(base), len(base) // 4)]
    interleaved = frames[0] + b"\x00\x00" + b"".join(frames[1:])
    assert parse_mp3_headers(interleaved)["n_frames"] == 4
    # a large trailer (ID3v1-style) ends the walk cleanly
    with_trailer = base + b"TAG" + b"\x00" * 125
    assert parse_mp3_headers(with_trailer)["n_frames"] == 4


def test_not_mp3_raises_value_error():
    for junk in (b"", b"RIFF1234WAVE", b"\xff\xd8\xff\xe0 jpeg not mp3"):
        with pytest.raises(ValueError):
            parse_mp3_headers(junk)


def test_mixed_sample_rate_stops_at_change():
    data = to_mp3_bytes(3, 128, 44100) + to_mp3_bytes(3, 128, 48000)
    assert parse_mp3_headers(data)["n_frames"] == 3


def test_sniff_format_routes_mp3():
    from wc_vector_indexing_spark.operators.bmp_gif import sniff_format

    assert sniff_format(to_mp3_bytes(2, 128, 44100)) == "mp3"
    assert sniff_format(to_mp3_bytes(2, 128, 44100, id3_comment=b"c")) == "mp3"
    assert sniff_format(b"\xff\xd8\xff") == "jpeg"  # JPEG SOI is not a sync
    assert sniff_format(b"\x00junk") == "unknown"


def test_writer_rejects_off_table_params():
    with pytest.raises(ValueError):
        to_mp3_bytes(3, 127, 44100)
    with pytest.raises(ValueError):
        to_mp3_bytes(3, 128, 22050)  # MPEG-2 rate, writer is MPEG-1


def test_id3v2_text_frames_roundtrip():
    """T*** frame extraction (id3.org v2.3/2.4): UTF-8 frames written
    by the fixture half come back; the frame walk is unaffected."""
    from wc_vector_indexing_spark.operators.mp3 import (
        parse_id3v2_text,
        parse_mp3_headers,
        to_mp3_bytes,
    )

    data = to_mp3_bytes(
        3, 128, 44100,
        id3_text={"TIT2": "Planted Title", "TPE1": "Crawlër", "TALB": "Fixtures"},
    )
    tags = parse_id3v2_text(data)
    assert tags == {"TIT2": "Planted Title", "TPE1": "Crawlër", "TALB": "Fixtures"}
    assert parse_mp3_headers(data)["n_frames"] == 3  # walk still skips the tag
    # tagless stream -> empty dict, not an error
    assert parse_id3v2_text(to_mp3_bytes(2)) == {}
    # COMM (non-text) frames are ignored but stepped over correctly
    both = to_mp3_bytes(2, id3_comment=b"note", id3_text={"TIT2": "X"})
    assert parse_id3v2_text(both) == {"TIT2": "X"}


def test_id3v2_text_encodings():
    from wc_vector_indexing_spark.operators.mp3 import parse_id3v2_text

    def tag(frames: bytes) -> bytes:
        size = len(frames)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        return b"ID3\x03\x00\x00" + ss + frames

    # v2.3 plain sizes; latin-1 and UTF-16-with-BOM encodings
    f1 = b"\x00" + "café".encode("latin-1")
    f2 = b"\x01" + ("\ufeff" + "naïve").encode("utf-16-le")  # explicit BOM
    frames = (
        b"TIT2" + len(f1).to_bytes(4, "big") + b"\x00\x00" + f1
        + b"TPE1" + len(f2).to_bytes(4, "big") + b"\x00\x00" + f2
    )
    assert parse_id3v2_text(tag(frames)) == {"TIT2": "café", "TPE1": "naïve"}


def test_xing_header_roundtrip():
    """Xing/Info VBR header in the first frame: the writer plants
    frames/bytes/TOC/quality, the parser reads them back; the raw frame
    walk still counts the metadata frame (callers use xing.n_frames for
    playable duration)."""
    from wc_vector_indexing_spark.operators.mp3 import (
        parse_mp3_headers,
        parse_xing_header,
        to_mp3_bytes,
    )

    for tag in ("Xing", "Info"):
        data = to_mp3_bytes(7, 128, 44100, xing_tag=tag)
        meta = parse_mp3_headers(data)
        assert meta["n_frames"] == 8  # 7 audio + 1 metadata frame
        x = meta["xing"]
        assert x is not None and x["tag"] == tag
        assert x["n_frames"] == 7 and x["has_toc"]
        assert x["n_bytes"] == len(data) and x["quality"] == 78
    # no tag -> None, and garbage after the side info is not a tag
    assert parse_mp3_headers(to_mp3_bytes(3))["xing"] is None
    assert parse_xing_header(b"\x00" * 2, 0) is None


def test_id3v22_three_char_frames():
    """ID3v2.2: 3-char ids + 3-byte sizes, translated to their v2.3
    names so downstream code keys uniformly on TIT2/TPE1/TALB."""
    from wc_vector_indexing_spark.operators.mp3 import (
        parse_id3v2_text,
        to_mp3_bytes,
    )

    def frame22(fid: bytes, text: bytes) -> bytes:
        body = b"\x00" + text  # latin-1
        return fid + len(body).to_bytes(3, "big") + body

    body = (frame22(b"TT2", b"Old Title") + frame22(b"TP1", b"Old Artist")
            + frame22(b"PIC", b"\x00notext"))
    size = len(body)
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    tag = b"ID3\x02\x00\x00" + syncsafe + body
    got = parse_id3v2_text(tag + to_mp3_bytes(1))
    assert got == {"TIT2": "Old Title", "TPE1": "Old Artist"}
