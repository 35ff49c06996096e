"""BMP + GIF decoders (operators/bmp_gif.py): bitwise roundtrips
against minimal in-test encoders (BMP is trivial framing; the GIF
encoder emits spec-shaped LZW), interlace, palettes, bottom-up rows,
and magic-byte sniffing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.bmp_gif import (
    decode_bmp,
    decode_gif,
    gif_frames,
    sniff_format,
)


# ------------------------------------------------------------------ BMP enc

def encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[:, :, [2, 1, 0]].reshape(h, -1)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (h if not top_down else -h), 1, 24, 0,
        len(pix), 2835, 2835, 0, 0,
    )
    return header + dib + pix


# ------------------------------------------------------------------ GIF enc

def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf = ()
    for v in indices:
        cand = buf + (v,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (v,)
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    h, w = idx.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1  # 2<<f >= n
    while (2 << size_field) < n:
        size_field += 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    pal = np.zeros((2 << size_field, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (89a feature)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    rows = idx
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = idx[order]
    min_code = max(2, size_field + 1)
    out.append(min_code)
    lzw = _lzw_encode(rows.reshape(-1).tolist(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _img(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------------- BMP

def test_bmp_roundtrip_bottom_up_and_top_down():
    img = _img(11, 7, seed=1)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img, top_down=True)), img)


def test_bmp_row_padding():
    img = _img(3, 5, seed=2)  # 15-byte rows -> padded to 16
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def encode_bmp_bitfields(
    img: np.ndarray, masks: tuple[int, int, int], bpp: int = 32
) -> bytes:
    """BI_BITFIELDS fixture: pack RGB through arbitrary channel masks
    (mask DWORDs follow the 40-byte header, as written by real
    encoders)."""
    h, w = img.shape[:2]

    def place(chan, mask):
        shift = (mask & -mask).bit_length() - 1
        maxv = mask >> shift
        return ((chan.astype(np.uint32) * maxv + 127) // 255) << np.uint32(shift)

    rm, gm, bm = masks
    vals = place(img[:, :, 0], rm) | place(img[:, :, 1], gm) | place(img[:, :, 2], bm)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    for i in range(nb):
        rows[:, i : w * nb : nb] = ((vals >> np.uint32(8 * i)) & 0xFF).astype(np.uint8)
    pix = rows[::-1].tobytes()
    off = 54 + 12
    header = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 3, len(pix), 2835, 2835, 0, 0
    )
    return header + dib + struct.pack("<III", rm, gm, bm) + pix


def test_bmp_bitfields_rgba_order_masks_honored():
    """r6 advice: non-default masks (R in the LOW byte — RGBA order)
    must decode with channels unswapped; 8-bit masks roundtrip
    exactly."""
    img = _img(7, 5, seed=3)
    data = encode_bmp_bitfields(img, (0x000000FF, 0x0000FF00, 0x00FF0000))
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_bitfields_rgb565():
    img = _img(6, 9, seed=4)
    data = encode_bmp_bitfields(img, (0xF800, 0x07E0, 0x001F), bpp=16)
    got = decode_bmp(data).astype(int)
    assert got.shape == img.shape
    assert np.abs(got - img.astype(int)).max() <= 9  # 5-bit quantization


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError, match="BM signature"):
        decode_bmp(b"PNG whatever")


# ---------------------------------------------------------------------- GIF

def test_gif_roundtrip_palette_image():
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (13, 9)).astype(np.uint8)
    got = decode_gif(encode_gif(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_gif_interlaced_roundtrip():
    rng = np.random.RandomState(4)
    palette = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (17, 6)).astype(np.uint8)
    got = decode_gif(encode_gif(idx, palette, interlace=True))
    assert np.array_equal(got, palette[idx])


def test_gif_lzw_table_growth():
    """An image large/varied enough to grow the LZW table through
    several code widths still roundtrips exactly."""
    rng = np.random.RandomState(5)
    palette = rng.randint(0, 256, (64, 3)).astype(np.uint8)
    idx = rng.randint(0, 64, (40, 40)).astype(np.uint8)
    got = decode_gif(encode_gif(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_gif_multiframe():
    rng = np.random.RandomState(6)
    palette = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    a = rng.randint(0, 4, (5, 5)).astype(np.uint8)
    b = rng.randint(0, 4, (5, 5)).astype(np.uint8)
    # concatenate two image blocks inside one GIF
    one = encode_gif(a, palette)
    two = encode_gif(b, palette)
    data = one[:-1] + two[13 + 4 * 3 + 8 :]  # strip two's header+GCT+GCE, keep frame
    frames = gif_frames(data)
    assert len(frames) == 2
    assert np.array_equal(frames[0], palette[a])
    assert np.array_equal(frames[1], palette[b])


def test_decode_image_dispatches_gif_and_bmp():
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _img(6, 6, seed=7)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    palette = _img(1, 8, seed=8)[0]
    idx = (np.arange(36).reshape(6, 6) % 8).astype(np.uint8)
    assert np.array_equal(decode_image(encode_gif(idx, palette)), palette[idx])


# -------------------------------------------------------------------- sniff

def test_sniff_format():
    from tests.test_jpeg import encode_baseline
    from tests.test_png import encode_png

    img = np.zeros((8, 8), dtype=np.uint8)
    assert sniff_format(encode_baseline(img)) == "jpeg"
    assert sniff_format(encode_png(_img(4, 4, seed=9))) == "png"
    assert sniff_format(encode_bmp(_img(4, 4))) == "bmp"
    pal = _img(1, 4, seed=10)[0]
    assert sniff_format(encode_gif((np.zeros((2, 2), np.uint8)), pal)) == "gif"
    assert sniff_format(b"P5\n1 1\n255\n\x00") == "pgm"
    assert sniff_format(b"%PDF-1.7 junk") == "pdf"
    assert sniff_format(b"WARC/1.0\r\n") == "warc"
    assert sniff_format(b"\x00\x01\x02") == "unknown"
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00")
    assert sniff_format(buf.getvalue()) == "wav"
    from wc_vector_indexing_spark.operators.video import write_mjpeg_avi

    assert sniff_format(write_mjpeg_avi([], 8, 8)) == "avi"
