"""TIFF IFD walk + JPEG/Exif metadata: writer/parser roundtrips over
both byte orders, multi-page chains, offset-heap values, cycle guard,
and sniff routing."""

from __future__ import annotations

import struct

import pytest

from wc_vector_indexing_spark.operators.bmp_gif import sniff_format
from wc_vector_indexing_spark.operators.tiff import (
    parse_exif,
    parse_tiff,
    to_jpeg_exif_bytes,
    to_tiff_bytes,
)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_roundtrip_both_byte_orders(order):
    t = to_tiff_bytes(1920, 1080, bits_per_sample=16, compression=5,
                      photometric=2, orientation=8, samples_per_pixel=3,
                      byte_order=order)
    got = parse_tiff(t)
    assert got == {
        "byte_order": order, "width": 1920, "height": 1080,
        "bits_per_sample": 16, "compression": 5, "photometric": 2,
        "orientation": 8, "samples_per_pixel": 3, "n_ifds": 1,
    }


def test_multipage_chain_counts_pages():
    t = to_tiff_bytes(100, 50, n_pages=4)
    assert parse_tiff(t)["n_ifds"] == 4


def test_defaults_when_tags_absent():
    # hand-built minimal IFD: width/height only — orientation and
    # samples_per_pixel fall back to the spec defaults (1, 1)
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 10) + b"\0\0"
    ifd += struct.pack("<HHI", 257, 3, 1) + struct.pack("<H", 20) + b"\0\0"
    ifd += struct.pack("<I", 0)
    t = b"II" + struct.pack("<HI", 42, 8) + ifd
    got = parse_tiff(t)
    assert (got["width"], got["height"]) == (10, 20)
    assert got["orientation"] == 1 and got["samples_per_pixel"] == 1
    assert got["bits_per_sample"] is None  # genuinely absent ≠ default


def test_cycle_guard():
    # next-IFD pointer loops back to IFD0: must be contract ValueError
    ifd = struct.pack("<H", 1)
    ifd += struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 1) + b"\0\0"
    ifd += struct.pack("<I", 8)  # next = self
    t = b"II" + struct.pack("<HI", 42, 8) + ifd
    with pytest.raises(ValueError, match="cycle"):
        parse_tiff(t)


def test_bad_signatures():
    with pytest.raises(ValueError):
        parse_tiff(b"XX" + struct.pack("<HI", 42, 8))
    with pytest.raises(ValueError):
        parse_tiff(b"II" + struct.pack("<HI", 43, 8) + bytes(8))


def test_exif_roundtrip():
    j = to_jpeg_exif_bytes(orientation=6, make="Canon", model="EOS R5",
                           datetime_original="2023:01:02 03:04:05")
    got = parse_exif(j)
    assert got == {
        "has_exif": True, "orientation": 6, "make": "Canon",
        "model": "EOS R5", "datetime_original": "2023:01:02 03:04:05",
    }


def test_exif_absent_segment():
    got = parse_exif(b"\xff\xd8\xff\xd9")
    assert got["has_exif"] is False and got["orientation"] is None


def test_exif_non_jpeg_raises():
    with pytest.raises(ValueError):
        parse_exif(b"II*\x00")


def test_exif_fill_bytes_before_marker():
    # JPEG B.1.1.2: 0xFF fill bytes may pad before any marker; a
    # spec-valid file must not be quarantined for them
    j = to_jpeg_exif_bytes(orientation=5)
    padded = j[:2] + b"\xff\xff\xff" + j[2:]
    got = parse_exif(padded)
    assert got["has_exif"] is True and got["orientation"] == 5


def test_exif_stops_at_sos():
    # APP1 after SOS must not be read (spec: metadata precedes scan)
    j = bytearray(to_jpeg_exif_bytes(orientation=3))
    body = b"\xff\xd8" + b"\xff\xda\x00\x04\0\0" + bytes(j[2:-2])
    got = parse_exif(bytes(body))
    assert got["has_exif"] is False


def test_sniff_routes_tiff():
    assert sniff_format(to_tiff_bytes(4, 4)) == "tiff"
    assert sniff_format(to_tiff_bytes(4, 4, byte_order="MM")) == "tiff"
    # Exif-bearing JPEG still sniffs as jpeg (container wins)
    assert sniff_format(to_jpeg_exif_bytes()) == "jpeg"
