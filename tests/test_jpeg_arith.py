"""Arithmetic-coded JPEG (operators/jpeg_arith.py): the QM coder pinned
as a mutual-inverse pair at three levels — raw bit coder over random
context streams, full SOF9 image roundtrips bit-identical to the
baseline-Huffman decode of the same quantized coefficients, and the
corrupt-stream quarantine contract. Compression sanity guards the
estimator table: arithmetic output must beat Huffman on random images
and collapse on flat ones."""

from __future__ import annotations

import random

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline,
)
from wc_vector_indexing_spark.operators.jpeg_arith import (
    _new_stats,
    _QMDecoder,
    _QMEncoder,
    encode_arith,
    encode_progressive_arith,
)


# ------------------------------------------------------------ raw coder
@pytest.mark.parametrize("seed", range(8))
def test_raw_coder_roundtrip(seed):
    rng = random.Random(seed)
    seq = [(rng.randrange(6), rng.randrange(2))
           for _ in range(rng.randrange(1, 4000))]
    enc = _QMEncoder()
    st = _new_stats(6)
    for ctx, b in seq:
        enc.code(st, ctx, b)
    data = enc.finish()
    dec = _QMDecoder(data, 0)
    st = _new_stats(6)
    assert [dec.decode(st, c) for c, _ in seq] == [b for _, b in seq]


def test_raw_coder_compresses():
    """Estimator-table guard: skewed input must compress, uniform must
    stay near 1 bit/symbol, constant must collapse — a transcription
    error in Table D.3 breaks these long before it breaks roundtrip."""
    rng = random.Random(1)

    def size(bits):
        enc = _QMEncoder()
        st = _new_stats(1)
        for b in bits:
            enc.code(st, 0, b)
        return len(enc.finish())

    assert size([0] * 8000) < 20
    assert size([1 if rng.random() < 0.05 else 0 for _ in range(8000)]) < 400
    uniform = size([rng.randrange(2) for _ in range(8000)])
    assert 950 < uniform < 1100


def test_raw_coder_stuffing_and_zero_tail():
    """Streams containing 0xFF data bytes must carry the stuffed 0x00
    and still roundtrip; decoding past the end feeds zero bits."""
    ff_streams = 0
    for seed in range(40):
        rng = random.Random(10_000 + seed)
        seq = [(0, rng.randrange(2)) for _ in range(600)]
        enc = _QMEncoder()
        st = _new_stats(1)
        for c, b in seq:
            enc.code(st, c, b)
        data = enc.finish()
        for i, byte in enumerate(data[:-1]):
            if byte == 0xFF:
                assert data[i + 1] == 0x00
                ff_streams += 1
        dec = _QMDecoder(data + b"\xff\xd9", 0)  # EOI directly after
        st = _new_stats(1)
        assert [dec.decode(st, c) for c, _ in seq] == [b for _, b in seq]
    assert ff_streams > 0  # the stuffing path was actually exercised


# ------------------------------------------------------------ full SOF9
@pytest.mark.parametrize(
    "shape,sub",
    [
        ((8, 8), "4:4:4"),
        ((16, 24), "4:4:4"),
        ((32, 32, 3), "4:4:4"),
        ((16, 16, 3), "4:2:0"),
        ((64, 48, 3), "4:2:0"),
    ],
)
def test_sof9_matches_baseline_decode(shape, sub):
    """Same image, same unit quant: the SOF9 decode must be
    bit-identical to the baseline-Huffman decode (shared coefficient
    truth, independent entropy layers)."""
    img = np.random.default_rng(42).integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_arith(img, sub)), decode_jpeg(encode_baseline(img, sub))
    )


def test_sof9_flat_and_gradient_images():
    flat = np.full((16, 16), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_arith(flat)), decode_jpeg(encode_baseline(flat)))
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (24, 1))
    assert np.array_equal(decode_jpeg(encode_arith(grad)), decode_jpeg(encode_baseline(grad)))
    # extreme values exercise the deep DC magnitude categories
    extreme = np.zeros((8, 16), dtype=np.uint8)
    extreme[:, 8:] = 255
    assert np.array_equal(
        decode_jpeg(encode_arith(extreme)), decode_jpeg(encode_baseline(extreme))
    )


def test_sof9_smaller_than_huffman_on_random():
    img = np.random.default_rng(7).integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    assert len(encode_arith(img)) < len(encode_baseline(img))


def test_sof9_corrupt_quarantine():
    img = np.random.default_rng(3).integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_arith(img)
    # truncation inside the entropy segment: decode must either raise
    # ValueError or return a frame of the declared shape (zero-fed
    # tail) — never crash with an internal error
    try:
        out = decode_jpeg(good[: len(good) // 2])
        assert out.shape == (16, 16)
    except ValueError:
        pass
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00" + good)


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((8, 8), "4:4:4"),
        ((16, 24), "4:4:4"),
        ((32, 32, 3), "4:4:4"),
        ((16, 16, 3), "4:2:0"),
        ((64, 48, 3), "4:2:0"),
    ],
)
def test_sof10_progressive_matches_baseline_decode(shape, sub):
    """Progressive arithmetic (SOF10): interleaved DC first + refine,
    per-band AC first + successive-approximation refine, statistics
    reset per scan — must reconstruct bit-identical to the baseline
    decode (Al=1 -> 0 is exact)."""
    img = np.random.default_rng(11).integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_progressive_arith(img, sub)),
        decode_jpeg(encode_baseline(img, sub)),
    )


def test_sof10_flat_and_extreme_images():
    flat = np.full((16, 16), 200, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_progressive_arith(flat)), decode_jpeg(encode_baseline(flat))
    )
    extreme = np.zeros((8, 16), dtype=np.uint8)
    extreme[:, 8:] = 255
    assert np.array_equal(
        decode_jpeg(encode_progressive_arith(extreme)),
        decode_jpeg(encode_baseline(extreme)),
    )


def test_sof10_truncation_quarantine():
    img = np.random.default_rng(5).integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_progressive_arith(img)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 3])


def test_dri_with_arithmetic_raises_documented_seam():
    img = np.random.default_rng(3).integers(0, 256, size=(8, 8), dtype=np.uint8)
    data = bytearray(encode_arith(img))
    i = data.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    data[i:i] = dri
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(bytes(data))
