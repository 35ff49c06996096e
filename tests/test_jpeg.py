"""Golden-pixel tests for the pure-numpy baseline JPEG decoder
(operators/jpeg.py). Fixtures come from a minimal in-test baseline
ENCODER (also straight from ITU-T T.81: FDCT + zigzag + canonical
Huffman + byte stuffing), so the decoder is checked as a true inverse —
near-lossless roundtrips with unit quantization tables, grayscale and
YCbCr 4:4:4 / 4:2:0, restart markers, and the documented
NotImplementedError seam for progressive files."""

from __future__ import annotations

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg import (  # noqa: F401
    _C,
    _ZIGZAG,
    decode_jpeg,
    encode_baseline,
)



# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 11) % 256).astype(np.uint8)


def test_grayscale_roundtrip_near_lossless():
    img = _gradient(24, 32)
    got = decode_jpeg(encode_baseline(img))
    assert got.shape == (24, 32)
    assert got.dtype == np.uint8
    # unit quant tables: the only loss is FDCT/IDCT float rounding
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_color_444_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    got = decode_jpeg(encode_baseline(img, "4:4:4"))
    assert got.shape == (16, 16, 3)
    # color roundtrip adds YCbCr forward/backward rounding
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3


def test_color_420_subsampling():
    """Chroma constant within each 2x2 block ⇒ 4:2:0 subsampling is
    information-lossless and the decoder's replication upsample must
    reconstruct the colors; per-pixel luma detail must survive."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8] = [200, 40, 40]
    img[8:] = [40, 40, 200]
    # texture constant within every 2x2 block, so chroma truly is
    # constant per subsampling cell (no information destroyed)
    yy, xx = np.mgrid[0:16, 0:16]
    img[:, :, 1] = (((yy // 2) * 7 + (xx // 2) * 11) % 64 + 30).astype(np.uint8)
    got = decode_jpeg(encode_baseline(img, "4:2:0"))
    assert got.shape == (16, 16, 3)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_restart_markers():
    img = _gradient(16, 40)  # 2x5 MCUs
    data = encode_baseline(img, restart_interval=2)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        for i in range(2, len(data) - 3)
    )
    got = decode_jpeg(data)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_byte_stuffing_roundtrip():
    """An image driving the entropy coder through 0xFF output bytes
    still decodes (stuffed 0xFF00 must be transparent)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    data = encode_baseline(img)
    got = decode_jpeg(data)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_progressive_raises_at_seam():
    # SOI + SOF2 header: the documented external-codec seam
    data = b"\xff\xd8" + bytes([0xFF, 0xC2, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="baseline sequential"):
        decode_jpeg(data)


def test_decode_image_dispatches_jpeg():
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _gradient(8, 8)
    got = decode_image(encode_baseline(img))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
