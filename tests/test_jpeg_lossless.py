"""Lossless JPEG (SOF3, T.81 Annex H) — exact-roundtrip pins.

Lossless makes the mutual-inverse pin total: decode(encode(img)) must
be bit-for-bit equal for every predictor, precision, component layout
and point transform."""

from __future__ import annotations

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg import decode_jpeg
from wc_vector_indexing_spark.operators.jpeg_lossless import (
    to_lossless_jpeg_bytes,
)


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_all_predictors_roundtrip_exact(predictor):
    rng = np.random.RandomState(predictor)
    img = rng.randint(0, 256, size=(11, 9), dtype=np.uint8)
    out = decode_jpeg(to_lossless_jpeg_bytes(img, predictor=predictor))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_16_and_12_bit_precision():
    rng = np.random.RandomState(42)
    img16 = rng.randint(0, 65536, size=(7, 8), dtype=np.uint16)
    out = decode_jpeg(to_lossless_jpeg_bytes(img16, predictor=4))
    assert out.dtype == np.uint16 and np.array_equal(out, img16)
    img12 = rng.randint(0, 4096, size=(6, 6)).astype(np.uint16)
    out = decode_jpeg(to_lossless_jpeg_bytes(img12, predictor=7, precision=12))
    assert np.array_equal(out, img12)


def test_three_component_returns_components_as_stored():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    out = decode_jpeg(to_lossless_jpeg_bytes(rgb, predictor=2))
    assert out.shape == (5, 4, 3) and np.array_equal(out, rgb)


def test_point_transform_shifts_back():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 128, size=(6, 5), dtype=np.uint8)
    out = decode_jpeg(to_lossless_jpeg_bytes(
        img, predictor=1, precision=8, point_transform=1))
    assert np.array_equal(out, (img.astype(np.uint16) << 1).astype(np.uint8))


def test_flat_and_gradient_images():
    # degenerate stats: all-equal (category 0 everywhere after the first
    # sample) and a worst-case alternating checkerboard
    flat = np.full((9, 9), 200, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(to_lossless_jpeg_bytes(flat)), flat)
    checker = np.indices((8, 8)).sum(axis=0) % 2 * 255
    checker = checker.astype(np.uint8)
    for p in (1, 4, 7):
        assert np.array_equal(
            decode_jpeg(to_lossless_jpeg_bytes(checker, predictor=p)), checker)


def test_corrupt_quarantine_and_seams():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = to_lossless_jpeg_bytes(img)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        to_lossless_jpeg_bytes(img, predictor=0)
    with pytest.raises(ValueError):
        # sample exceeds precision - point transform
        to_lossless_jpeg_bytes(img + 100, precision=7)
    # hierarchical (SOF5) stays a documented seam
    hier = bytearray(blob)
    sof = hier.find(b"\xff\xc3")
    hier[sof + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="hierarchical"):
        decode_jpeg(bytes(hier))
