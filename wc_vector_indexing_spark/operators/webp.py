"""WebP dimension/feature triage (the public RIFF container + VP8/
VP8L/VP8X headers, RFC 9649): width, height, lossless/alpha/animation
flags WITHOUT decoding — the web's second image format after JPEG, and
the one crawl pipelines meet with no stdlib decoder. Full pixel decode
stays behind the external-codec seam (operators/multimodal.py), same
posture as the audio/video triage family.

Grammar: 'RIFF'+size+'WEBP', then one chunk of
- 'VP8 ' (lossy): 3-byte frame tag, 0x9D 0x01 0x2A start code, two
  little-endian uint16 whose low 14 bits are width/height;
- 'VP8L' (lossless): 0x2F signature, then width-1/height-1 as two
  14-bit fields packed little-endian, plus the alpha hint bit;
- 'VP8X' (extended): feature flags byte and 24-bit canvas
  width-1/height-1.

Spark shape: constant-time per-blob header read, zero shuffle.

Reference note: the reference engine decodes no images (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine


@quarantine("webp")
def parse_webp(data: bytes) -> dict:
    """→ variant ('vp8'|'vp8l'|'vp8x'), width, height, lossless,
    has_alpha, animated. Raises ValueError for non-WebP bytes."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("WebP: missing RIFF/WEBP signature")
    fourcc = data[12:16]
    size = struct.unpack("<I", data[16:20])[0]
    body = data[20 : 20 + size]
    if len(body) < size:
        raise ValueError("WebP: first chunk overruns the file")
    if fourcc == b"VP8 ":
        if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("WebP: bad VP8 key-frame start code")
        w, h = struct.unpack("<HH", body[6:10])
        return {
            "variant": "vp8", "width": w & 0x3FFF, "height": h & 0x3FFF,
            "lossless": False, "has_alpha": False, "animated": False,
        }
    if fourcc == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise ValueError("WebP: bad VP8L signature byte")
        bits = struct.unpack("<I", body[1:5])[0]
        return {
            "variant": "vp8l",
            "width": (bits & 0x3FFF) + 1,
            "height": ((bits >> 14) & 0x3FFF) + 1,
            "lossless": True,
            "has_alpha": bool((bits >> 28) & 1),
            "animated": False,
        }
    if fourcc == b"VP8X":
        if len(body) < 10:
            raise ValueError("WebP: short VP8X chunk")
        flags = body[0]
        w = int.from_bytes(body[4:7], "little") + 1
        h = int.from_bytes(body[7:10], "little") + 1
        return {
            "variant": "vp8x", "width": w, "height": h,
            "lossless": False,
            "has_alpha": bool(flags & 0x10),
            "animated": bool(flags & 0x02),
        }
    raise ValueError(f"WebP: unknown first chunk {fourcc!r}")


def to_webp_bytes(
    variant: str,
    width: int,
    height: int,
    has_alpha: bool = False,
    animated: bool = False,
) -> bytes:
    """Fixture/export half: a valid RIFF envelope around a header-only
    chunk (payload is deterministic filler — the triage never reads
    past the dimension fields)."""
    if variant == "vp8":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack(
            "<HH", width & 0x3FFF, height & 0x3FFF
        ) + bytes(16)
    elif variant == "vp8l":
        bits = (
            (width - 1) & 0x3FFF
            | (((height - 1) & 0x3FFF) << 14)
            | (int(has_alpha) << 28)
        )
        body = b"\x2f" + struct.pack("<I", bits) + bytes(16)
    elif variant == "vp8x":
        flags = (0x10 if has_alpha else 0) | (0x02 if animated else 0)
        body = (
            bytes([flags]) + b"\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
    else:
        raise ValueError("variant must be vp8|vp8l|vp8x")
    fourcc = {"vp8": b"VP8 ", "vp8l": b"VP8L", "vp8x": b"VP8X"}[variant]
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
