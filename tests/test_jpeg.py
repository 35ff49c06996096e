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


def _prog_pair(img, subsampling="4:4:4"):
    from wc_vector_indexing_spark.operators.jpeg import encode_progressive

    prog = encode_progressive(img, subsampling=subsampling)
    base = encode_baseline(img, subsampling=subsampling)
    return decode_jpeg(prog), decode_jpeg(base), prog


def test_progressive_grayscale_matches_baseline_exactly():
    """Successive approximation at depth 1 reconstructs every
    coefficient exactly, so the progressive decode must be
    bit-identical to the baseline decode of the same quantized
    coefficients — a golden inverse with no tolerance."""
    got, want, prog = _prog_pair(_gradient(24, 32))
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog  # really SOF2
    assert prog.count(b"\xff\xda") == 6  # DC first+refine, 2 bands x first+refine
    assert np.array_equal(got, want)


def test_progressive_flat_image_exercises_cross_block_eob_runs():
    img = np.full((32, 40), 128, dtype=np.uint8)
    img[4:8, 4:8] = 200  # one busy block, many all-zero AC bands
    got, want, _ = _prog_pair(img)
    assert np.array_equal(got, want)


def test_progressive_color_444():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    got, want, prog = _prog_pair(img)
    # per-component AC scans: 2 + 3 comps x 2 bands x 2 passes = 14
    assert prog.count(b"\xff\xda") == 14
    assert np.array_equal(got, want)


def test_progressive_color_420_subsampled():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    got, want, _ = _prog_pair(img, subsampling="4:2:0")
    assert np.array_equal(got, want)


def test_progressive_dispatches_through_decode_image():
    from wc_vector_indexing_spark.operators.jpeg import encode_progressive
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _gradient(16, 16)
    assert np.array_equal(
        decode_image(encode_progressive(img)), decode_jpeg(encode_baseline(img))
    )


def test_truncated_progressive_raises_value_error():
    from wc_vector_indexing_spark.operators.jpeg import encode_progressive

    data = encode_progressive(_gradient(24, 32))
    with pytest.raises(ValueError):
        decode_jpeg(data[: int(len(data) * 0.6)])


def test_truncated_progressive_lone_trailing_ff_raises_value_error():
    """A file cut so its last byte is a lone 0xFF made the round-7
    post-scan marker search return pos == len-1, after which the main
    marker loop read data[i+1] and raised IndexError — outside the
    quarantine contract (ValueError for corrupt media)."""
    from wc_vector_indexing_spark.operators.jpeg import encode_progressive

    data = encode_progressive(_gradient(24, 32))
    eoi = data.rfind(b"\xff\xd9")
    assert eoi != -1
    for cut in (data[:eoi] + b"\xff", data[: eoi + 1]):
        with pytest.raises(ValueError):
            decode_jpeg(cut)


def test_hierarchical_raises_at_seam():
    # SOI + SOF5 (differential/hierarchical): the remaining
    # external-codec seam now that SOF0/SOF2/SOF9/SOF10 all decode for
    # real (operators/jpeg.py + jpeg_arith.py)
    data = b"\xff\xd8" + bytes([0xFF, 0xC5, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="FFC5"):
        decode_jpeg(data)


def test_decode_image_dispatches_jpeg():
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _gradient(8, 8)
    got = decode_image(encode_baseline(img))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
