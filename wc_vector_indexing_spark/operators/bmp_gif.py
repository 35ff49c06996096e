"""BMP and GIF decoders — pure stdlib+numpy, completing the web-image
format set (JPEG/PNG/BMP/GIF cover essentially every image a crawl
yields; everything is public file-format documentation: the Windows
BITMAPINFOHEADER layout and the GIF87a/89a specification with its LZW
variant).

BMP: uncompressed BI_RGB, 8-bit palette / 24-bit BGR / 32-bit BGRA,
bottom-up or top-down rows, 4-byte row padding.

GIF: 87a and 89a, global/local color tables, interlaced or not, the
first image frame (animation = repeated frames; callers wanting every
frame iterate ``gif_frames``). LZW decompression follows the spec's
variable-code-width algorithm (clear/EOI codes, table growth to 12
bits).

Dispatched from ``multimodal.decode_image`` by magic bytes; runs in the
same zero-shuffle Arrow pass as the other decoders."""

from __future__ import annotations

import struct

import numpy as np

from wc_vector_indexing_spark.operators.contract import quarantine


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

@quarantine("bmp")
def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to ``(h, w, 3)`` RGB uint8."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM signature)")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS
        raise NotImplementedError(f"BMP compression {compression} not supported")
    top_down = h < 0
    h = abs(h)
    if compression == 3:
        # BI_BITFIELDS: the channel masks are authoritative — assuming
        # BGR(A) order silently swaps channels for e.g. RGBA-masked
        # files and corrupts downstream perceptual hashes. The three
        # mask DWORDs follow BITMAPINFOHEADER (and sit at the same
        # offset inside the V4/V5 headers).
        if bpp not in (16, 32):
            raise NotImplementedError(
                f"BMP BI_BITFIELDS with bit depth {bpp} not supported"
            )
        rm, gm, bm = struct.unpack_from("<III", data, 54)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        raw = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=pixel_off
        ).reshape(h, stride)[:, : w * nb]
        vals = np.zeros((h, w), dtype=np.uint32)
        for i in range(nb):  # little-endian pixel words
            vals |= raw[:, i::nb].astype(np.uint32) << np.uint32(8 * i)

        def chan(mask: int) -> np.ndarray:
            if mask == 0:
                return np.zeros((h, w), dtype=np.uint8)
            shift = (mask & -mask).bit_length() - 1
            maxv = mask >> shift
            v = (vals & np.uint32(mask)) >> np.uint32(shift)
            # scale an n-bit channel to 8 bits (565 / 555 / 888 all land
            # exactly: maxv*255/maxv == 255)
            return ((v * 255) // np.uint32(maxv)).astype(np.uint8)

        img = np.stack([chan(rm), chan(gm), chan(bm)], axis=-1)
    elif bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=pixel_off
        ).reshape(h, stride)[:, :w]
        img = pal[rows]
    elif bpp in (24, 32):
        ch = bpp // 8
        stride = (w * ch + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=pixel_off
        ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        img = rows[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    else:
        raise NotImplementedError(f"BMP bit depth {bpp} not supported")
    return img if top_down else img[::-1].copy()


# --------------------------------------------------------------------------
# GIF
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (spec appendix): variable code width starting at
    min_code_size+1, CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


@quarantine("gif")
def gif_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode GIF image frames to RGB arrays (transparency index, if
    declared, resolves to the color-table value — compositing of
    partial animation frames is out of scope for feature extraction)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: introducer, label, sub-blocks
            pos += 2
            # sub-block walk: lengths come from the file, so a GIF cut
            # off mid-block would index past EOF without the bound
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("truncated GIF: extension overruns file")
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated GIF: short image descriptor")
            fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if pos + n * 3 > len(data):
                    raise ValueError("truncated GIF: short color table")
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            if pos >= len(data):
                raise ValueError("truncated GIF: missing LZW data")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(data):
                raise ValueError("truncated GIF: pixel data overruns file")
            pos += 1
            idx = np.array(_lzw_decode(bytes(lzw), min_code), dtype=np.int64)
            if len(idx) < fw * fh:
                raise ValueError("GIF frame pixel data truncated")
            grid = np.zeros((fh, fw), dtype=np.int64)
            flat = idx[: fw * fh].reshape(-1, fw)
            if iflags & 0x40:  # interlaced: 4 passes by row stride
                rows = []
                for start, step in _GIF_INTERLACE:
                    rows.extend(range(start, fh, step))
                grid[rows] = flat
            else:
                grid = flat
            frames.append(table[np.clip(grid, 0, len(table) - 1)])
            if max_frames and len(frames) >= max_frames:
                break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


@quarantine("gif")
def decode_gif(data: bytes) -> np.ndarray:
    """First frame as ``(h, w, 3)`` RGB uint8."""
    return gif_frames(data, max_frames=1)[0]


# --------------------------------------------------------------------------
# magic-byte sniffing (the crawl-side mime triage)
# --------------------------------------------------------------------------

_MAGICS = (
    (b"\xff\xd8", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"P5", "pgm"), (b"P2", "pgm"), (b"P6", "ppm"), (b"P3", "ppm"),
    (b"RIFF", "riff"),  # refined below: WAVE / AVI
    (b"\x1f\x8b", "gzip"),
    (b"%PDF", "pdf"),
    (b"WARC/", "warc"),
    (b"ID3", "mp3"),  # ID3v2-tagged MPEG audio; bare-sync case below
    (b"fLaC", "flac"),
    (b"OggS", "ogg"),
    (b"PAR1", "parquet"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"FORM", "form"),  # refined below: AIFF / AIFC
    (b".snd", "au"),
)


def sniff_format(content: bytes) -> str:
    """Format name from magic bytes — the cheap triage a crawl pipeline
    runs before routing bytes to a decoder ('unknown' = route to the
    external-codec seam or quarantine)."""
    b = content or b""
    for magic, name in _MAGICS:
        if b.startswith(magic):
            if name == "riff":
                tag = b[8:12]
                return {b"WAVE": "wav", b"AVI ": "avi", b"WEBP": "webp"}.get(
                    tag, "riff"
                )
            if name == "form":
                return "aiff" if b[8:12] in (b"AIFF", b"AIFC") else "form"
            return name
    # tagless MPEG audio: 11-bit frame sync with valid version/layer
    # bits (0xFF Ex/Fx, not the 0xFF 0xD8 JPEG case handled above).
    # ADTS AAC shares the 0xFFFx sync but carries layer bits 00 —
    # that's exactly how the two are told apart (ISO 14496-3 vs 11172-3)
    if len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
        version_bits = (b[1] >> 3) & 0x03
        layer_bits = (b[1] >> 1) & 0x03
        if (b[1] & 0xF0) == 0xF0 and layer_bits == 0:
            return "aac"
        if version_bits != 1 and layer_bits != 0:
            return "mp3"
    # ISOBMFF containers (mp4/mov/m4a/heic): the magic sits at offset 4
    if len(b) >= 8 and b[4:8] == b"ftyp":
        return "mp4"
    # H.264 Annex B byte stream: 3/4-byte start code + forbidden-zero
    # NAL header (crawls carry elementary .264/.h264 dumps this way)
    if (b.startswith(b"\x00\x00\x00\x01") and len(b) > 4 and not b[4] & 0x80) or (
        b.startswith(b"\x00\x00\x01") and len(b) > 3 and not b[3] & 0x80
    ):
        return "h264"
    return "unknown"
