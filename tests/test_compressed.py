"""Gzip member / zstd frame triage (operators/compressed.py):
writer-inverse roundtrips over the flag grid, stdlib-written gzip as
an independent writer, zstd raw/RLE/FCS-width block walks, and the
corrupt-bytes ValueError quarantine contract."""

from __future__ import annotations

import gzip as stdlib_gzip
import io

import pytest

from wc_vector_indexing_spark.operators.bmp_gif import sniff_format
from wc_vector_indexing_spark.operators.compressed import (
    parse_gzip_member,
    parse_zstd_frame,
    to_gzip_bytes,
    to_zstd_frame_bytes,
)


# ------------------------------------------------------------------ gzip
def test_gzip_roundtrip_full_header():
    data = to_gzip_bytes(
        b"hello world" * 40, mtime=1_700_000_000, fname="corpus.txt",
        os_byte=3, ftext=True,
    )
    m = parse_gzip_member(data)
    assert m == {
        "mtime": 1_700_000_000, "os": "unix", "fname": "corpus.txt",
        "ftext": True, "isize": 440,
    }
    # body must still be a valid gzip member end-to-end
    assert stdlib_gzip.decompress(data) == b"hello world" * 40


def test_gzip_stdlib_written_member_parses():
    """Independent writer: CPython's gzip module."""
    buf = io.BytesIO()
    with stdlib_gzip.GzipFile(
        filename="a.bin", mode="wb", fileobj=buf, mtime=123456
    ) as f:
        f.write(b"x" * 1000)
    m = parse_gzip_member(buf.getvalue())
    assert m["mtime"] == 123456
    assert m["fname"] == "a.bin"
    assert m["isize"] == 1000
    # gzip.compress writes no FNAME and mtime as given
    m2 = parse_gzip_member(stdlib_gzip.compress(b"abc", mtime=9))
    assert m2["fname"] is None and m2["mtime"] == 9 and m2["isize"] == 3


def test_gzip_isize_is_mod_2_32():
    data = to_gzip_bytes(b"", mtime=0)
    assert parse_gzip_member(data)["isize"] == 0


def test_gzip_corrupt_quarantine():
    good = to_gzip_bytes(b"payload", fname="f")
    with pytest.raises(ValueError, match="magic"):
        parse_gzip_member(b"PK" + good[2:])
    with pytest.raises(ValueError, match="method"):
        parse_gzip_member(good[:2] + b"\x07" + good[3:])
    with pytest.raises(ValueError, match="FNAME"):
        parse_gzip_member(good[:10] + b"never-terminated")
    with pytest.raises(ValueError, match="magic"):
        parse_gzip_member(b"")


# ------------------------------------------------------------------ zstd
@pytest.mark.parametrize("n,block", [(0, 64), (1, 64), (100, 7), (5000, 1024)])
def test_zstd_raw_block_walk(n, block):
    content = bytes(i & 0xFF for i in range(n))
    m = parse_zstd_frame(to_zstd_frame_bytes(content, block_size=block))
    assert m["content_size"] == n
    assert m["decoded_size"] == n
    assert m["n_blocks"] == max(1, -(-n // block))
    assert m["window_log"] == 20 and not m["single_segment"]


def test_zstd_fcs_field_widths():
    # 1-byte FCS: single-segment small frame
    m = parse_zstd_frame(to_zstd_frame_bytes(b"x" * 200, single_segment=True))
    assert m["content_size"] == 200 and m["single_segment"]
    assert m["window_log"] is None
    # 2-byte FCS stores size-256
    m = parse_zstd_frame(to_zstd_frame_bytes(b"x" * 300))
    assert m["content_size"] == 300
    # 4-byte FCS above 65791
    m = parse_zstd_frame(to_zstd_frame_bytes(b"x" * 70000, block_size=32768))
    assert m["content_size"] == 70000
    # FCS absent → None, block walk still sizes the frame
    m = parse_zstd_frame(to_zstd_frame_bytes(b"x" * 50, with_fcs=False))
    assert m["content_size"] is None and m["decoded_size"] == 50


def test_zstd_rle_and_flags():
    data = to_zstd_frame_bytes(
        b"\x07" * 999, rle_byte=7, dict_id=0xBEEF, checksum=True
    )
    m = parse_zstd_frame(data)
    assert m["n_blocks"] == 1
    assert m["decoded_size"] == 999
    assert m["dict_id"] == 0xBEEF
    assert m["has_checksum"]


def test_zstd_window_descriptor_mantissa():
    # RFC 8878: Window_Size = (1<<(10+exp)) + (mantissa << (10+exp-3)).
    # The writer emits mantissa 0; patch the descriptor byte to check the
    # parser reads the exact size, not just the floor.
    frame = bytearray(to_zstd_frame_bytes(b"x" * 10, window_log=20))
    m = parse_zstd_frame(bytes(frame))
    assert m["window_log"] == 20 and m["window_size"] == 1 << 20
    frame[5] = ((20 - 10) << 3) | 5  # exp=10, mantissa=5
    m = parse_zstd_frame(bytes(frame))
    assert m["window_log"] == 20
    assert m["window_size"] == (1 << 20) + (5 << 17)
    # single-segment → both None
    m = parse_zstd_frame(to_zstd_frame_bytes(b"x" * 9, single_segment=True))
    assert m["window_size"] is None


def test_zstd_four_byte_dict_id():
    m = parse_zstd_frame(to_zstd_frame_bytes(b"q" * 40, dict_id=0x1234_5678))
    assert m["dict_id"] == 0x1234_5678


def test_zstd_corrupt_quarantine():
    good = to_zstd_frame_bytes(b"y" * 100)
    with pytest.raises(ValueError, match="magic"):
        parse_zstd_frame(b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated"):
        parse_zstd_frame(good[:6])  # chopped inside the FCS field
    with pytest.raises(ValueError, match="truncated block"):
        parse_zstd_frame(good[:11])  # chopped inside a block header
    with pytest.raises(ValueError, match="overruns"):
        parse_zstd_frame(good[:-20])
    # reserved FHD bit
    bad = bytearray(good)
    bad[4] |= 0x08
    with pytest.raises(ValueError, match="reserved"):
        parse_zstd_frame(bytes(bad))


def test_sniff_routes_compressed():
    assert sniff_format(to_zstd_frame_bytes(b"z")) == "zstd"
    assert sniff_format(to_gzip_bytes(b"z")) == "gzip"
