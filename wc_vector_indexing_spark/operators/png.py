"""Pure stdlib+numpy PNG decoder (RFC 2083 / W3C PNG spec).

Together with the baseline JPEG decoder (operators/jpeg.py) this covers
the two formats that make up nearly all crawled web images, with zero
external codecs: PNG's DEFLATE stream is stdlib ``zlib``, and the five
scanline filters (None/Sub/Up/Average/Paeth) reverse in numpy/bytes
arithmetic. Supported: bit depth 8 and 16, color types grayscale (0),
RGB (2), palette (3), gray+alpha (4), RGBA (6), non-interlaced.
Adam7 interlacing raises ``NotImplementedError`` at the documented
codec seam (rare in practice; plug Pillow there on a cluster that
ships it).

``multimodal.decode_image`` dispatches the PNG magic here; the decode
runs inside the same zero-shuffle Arrow map pass as JPEG/netpbm."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
            if interlace:
                raise NotImplementedError(
                    "Adam7-interlaced PNG needs an external codec (plug "
                    "Pillow at multimodal.decode_image)"
                )
            if depth not in (8, 16) or color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} not supported"
                )
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color = ihdr
    nch = _CHANNELS[color]
    bpp = nch * (depth // 8)  # filter unit: bytes per complete pixel
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    # reverse scanline filters (spec §6): row-sequential, vectorized
    # along the row where the filter's data dependency allows
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential in x (left-neighbour chain)
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
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
