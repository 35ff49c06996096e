"""Pure stdlib+numpy PNG decoder (RFC 2083 / W3C PNG spec).

Together with the baseline JPEG decoder (operators/jpeg.py) this covers
the two formats that make up nearly all crawled web images, with zero
external codecs: PNG's DEFLATE stream is stdlib ``zlib``, and the five
scanline filters (None/Sub/Up/Average/Paeth) reverse in numpy/bytes
arithmetic. Supported: bit depth 8 and 16, color types grayscale (0),
RGB (2), palette (3), gray+alpha (4), RGBA (6), and BOTH interlace
methods — progressive Adam7 files reassemble from their seven
sub-images (each an independently filtered image per spec §8.2).

``multimodal.decode_image`` dispatches the PNG magic here; the decode
runs inside the same zero-shuffle Arrow map pass as JPEG/netpbm."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from wc_vector_indexing_spark.operators.contract import quarantine

_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}



# Adam7 pass grid (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, offset: int, h: int, stride: int, bpp: int):
    """Reverse the scanline filters (spec §6) for one (sub-)image of
    ``h`` rows x ``stride`` bytes starting at ``offset`` in the
    decompressed stream; returns (rows, next_offset). Row-sequential,
    vectorized along the row where the filter\'s data dependency
    allows."""
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: out[x] = raw[x] + out[x-bpp] is a
            # per-byte-lane prefix sum; uint8 cumsum wraps mod 256 for
            # free, so the whole row vectorizes
            lanes = row.reshape(-1, bpp)
            row = np.cumsum(lanes, axis=0, dtype=np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = out[y].astype(np.int32)
    return out, offset + h * (stride + 1)


@quarantine("png")
def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8/uint16 ``(h, w)``, ``(h, w, 3)`` or
    ``(h, w, 4)`` (palette images expand to RGB; gray+alpha to
    ``(h, w, 2)``)."""
    if not data or data[:8] != _MAGIC:
        raise ValueError("not a PNG (missing signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG: chunk overruns the file")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) < 4:
            raise ValueError("truncated PNG: chunk CRC cut off")
        # verify the per-chunk CRC the spec mandates (§5.3): interior
        # corruption must be DETECTED here, not decoded into silently
        # wrong pixels that feed image dedup downstream
        if struct.unpack(">I", crc)[0] != zlib.crc32(ctype + chunk):
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype!r} chunk")
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            if len(chunk) < 13:
                raise ValueError("truncated PNG: short IHDR")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk[:13])
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            if depth not in (8, 16) or color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} not supported"
                )
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            ihdr = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, interlace = ihdr
    nch = _CHANNELS[color]
    bpp = nch * (depth // 8)  # filter unit: bytes per complete pixel
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt/truncated DEFLATE stream — surface
        # the same exception type every decoder here uses for bad input
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        out, _ = _unfilter(raw, 0, h, stride, bpp)
    else:  # Adam7: seven independently-filtered sub-images (spec §8.2)
        out = np.zeros((h, stride), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _unfilter(raw, pos, ph, pw * bpp, bpp)
            for py in range(ph):
                y = y0 + py * dy
                for px in range(pw):
                    x = x0 + px * dx
                    out[y, x * bpp : (x + 1) * bpp] = sub[py, px * bpp : (px + 1) * bpp]
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if depth == 16:
        img = out.reshape(h, w, nch, 2).astype(np.uint16)
        img = (img[..., 0] << 8) | img[..., 1]
    else:
        img = out.reshape(h, w, nch)
    if color == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[..., 0]]
    if img.shape[-1] == 1:
        img = img[..., 0]
    return img
