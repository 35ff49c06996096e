"""Golden-pixel tests for the stdlib+numpy PNG decoder
(operators/png.py). Fixtures come from a minimal in-test PNG encoder
(zlib + chunk framing + each of the five scanline filters), so every
filter type, color type, and bit depth is checked as an exact
roundtrip — PNG is lossless, so equality is bitwise."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.png import decode_png


# --------------------------------------------------------------------------
# minimal encoder (fixture generator)
# --------------------------------------------------------------------------

def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) if len(r) > bpp else np.zeros_like(r)
    upleft = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]]) if len(p) > bpp else np.zeros_like(p)
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - ((left + p) >> 1)
    elif ftype == 4:
        pr = left + p - upleft
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft))
        out = r - pred
    return bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes()


def encode_png(
    img: np.ndarray,
    color: int | None = None,
    filters: list[int] | int = 0,
    palette: np.ndarray | None = None,
    interlace: int = 0,
) -> bytes:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    depth = 16 if img.dtype == np.uint16 else 8
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    bpp = nch * (depth // 8)
    if depth == 16:
        rows = np.zeros((h, w * bpp), dtype=np.uint8)
        rows[:, 0::2] = (img.reshape(h, -1) >> 8).astype(np.uint8)
        rows[:, 1::2] = (img.reshape(h, -1) & 0xFF).astype(np.uint8)
    else:
        rows = img.reshape(h, w * bpp).astype(np.uint8)
    flist = filters if isinstance(filters, list) else [filters] * max(h, 1)

    def filtered_stream(img_rows):
        raw = bytearray()
        prev = np.zeros(img_rows.shape[1], dtype=np.uint8) if len(img_rows) else None
        for y in range(len(img_rows)):
            raw += _filter_row(flist[y % len(flist)], img_rows[y], prev, bpp)
            prev = img_rows[y]
        return raw

    if interlace:
        # Adam7: each pass is an independently filtered sub-image
        raw = bytearray()
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        px_rows = rows.reshape(h, w, bpp)
        for x0, y0, dx, dy in passes:
            sub = px_rows[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            raw += filtered_stream(sub.reshape(sub.shape[0], -1))
    else:
        raw = filtered_stream(rows)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return bytes(out)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _img(h, w, c=None, seed=0, dtype=np.uint8):
    rng = np.random.RandomState(seed)
    hi = 65536 if dtype == np.uint16 else 256
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, hi, shape).astype(dtype)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_roundtrips_exactly(ftype):
    img = _img(13, 17, 3, seed=ftype)
    assert np.array_equal(decode_png(encode_png(img, filters=ftype)), img)


def test_mixed_filters_per_row():
    img = _img(20, 9, 3, seed=7)
    got = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, img)


def test_grayscale_and_alpha_types():
    g = _img(11, 5, seed=1)
    assert np.array_equal(decode_png(encode_png(g, filters=4)), g)
    ga = _img(6, 6, 2, seed=2)
    assert np.array_equal(decode_png(encode_png(ga, filters=2)), ga)
    rgba = _img(8, 3, 4, seed=3)
    assert np.array_equal(decode_png(encode_png(rgba, filters=1)), rgba)


def test_palette_expands_to_rgb():
    pal = _img(16, 3, seed=4)  # 16-color palette
    idx = (_img(10, 10, seed=5) % 16).astype(np.uint8)
    data = encode_png(idx[:, :, None], color=3, filters=1, palette=pal)
    assert np.array_equal(decode_png(data), pal[idx])


def test_16bit_depth():
    img = _img(7, 7, 3, seed=6, dtype=np.uint16)
    got = decode_png(encode_png(img, filters=2))
    assert got.dtype == np.uint16
    assert np.array_equal(got, img)


@pytest.mark.parametrize("shape", [(16, 16, 3), (13, 11, 3), (7, 5, None), (3, 2, None)])
def test_adam7_interlaced_roundtrip(shape):
    """Adam7 files reassemble exactly — including non-multiple-of-8
    dimensions where later passes are ragged and some passes can be
    empty."""
    h, w, c = shape
    img = _img(h, w, c, seed=h * 31 + w)
    got = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4], interlace=1))
    assert np.array_equal(got, img)


def test_adam7_palette_and_16bit():
    pal = _img(8, 3, seed=21)
    idx = (_img(9, 10, seed=22) % 8).astype(np.uint8)
    data = encode_png(idx[:, :, None], color=3, filters=1, palette=pal, interlace=1)
    assert np.array_equal(decode_png(data), pal[idx])
    img16 = _img(6, 9, 3, seed=23, dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(img16, filters=4, interlace=1)), img16)


def test_decode_image_dispatches_png():
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _img(9, 9, 3, seed=8)
    assert np.array_equal(decode_image(encode_png(img, filters=4)), img)


def test_not_a_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a")
