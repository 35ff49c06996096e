"""TIFF 6.0 IFD triage and JPEG/Exif metadata — the remaining big
image container in a crawl corpus (scans, faxes, camera originals)
and the camera-metadata sidecar riding inside JPEG APP1. Joins the
header-triage family (operators/webp.py, mp4.py, flac.py, ogg.py):
dimensions/encoding/orientation WITHOUT decoding pixels; full decode
stays behind the external-codec seam, same posture as AAC/H.264.

Grammar (public TIFF 6.0 spec): 2-byte order mark (``II`` little /
``MM`` big) + magic 42 + offset of IFD0; each IFD is a u16 entry
count, then 12-byte entries (tag u16, type u16, count u32, value u32
— inline when the value fits 4 bytes, else an offset), then the next
IFD's offset (0 = end). Exif (CIPA DC-008) is the SAME structure
embedded in a JPEG APP1 segment after the ``Exif\\0\\0`` header, with
a private Exif sub-IFD hung off tag 0x8769; all Exif offsets are
relative to the embedded TIFF header, not the JPEG file.

Spark shape: constant-time per-blob header walk (only the IFD tables
are read, never strip data), zero shuffle. IFD chain walk carries a
seen-offset cycle guard — a corrupt next-IFD pointer must quarantine,
not hang an executor.

Reference note: the reference engine decodes no images (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct

from wc_vector_indexing_spark.operators.contract import quarantine

# tag → census field
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 274
_TAG_SAMPLES = 277
_TAG_EXIF_IFD = 0x8769
_TAG_DATETIME_ORIGINAL = 0x9003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, pos: int, endian: str) -> tuple[dict, int]:
    """One IFD table at ``pos`` → ({tag: first_value}, next_ifd_offset).
    SHORT/LONG/BYTE read numerically; ASCII read as a NUL-terminated
    string; other types recorded as None (triage never needs them)."""
    if pos + 2 > len(data):
        raise ValueError("TIFF: IFD offset past EOF")
    (n,) = struct.unpack_from(endian + "H", data, pos)
    end = pos + 2 + 12 * n
    if end + 4 > len(data):
        raise ValueError("TIFF: IFD table overruns the file")
    entries: dict[int, object] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(
            endian + "HHI", data, pos + 2 + 12 * i)
        vpos = pos + 2 + 12 * i + 8
        size = _TYPE_SIZES.get(typ)
        if size is None:
            entries[tag] = None
            continue
        total = size * count
        if total > 4:  # value lives at an offset
            (vpos,) = struct.unpack_from(endian + "I", data, vpos)
            if vpos + total > len(data):
                raise ValueError(f"TIFF: tag {tag} value past EOF")
        if typ == 2:  # ASCII
            raw = data[vpos:vpos + count]
            entries[tag] = raw.split(b"\0", 1)[0].decode(
                "ascii", errors="replace")
        elif typ in (1, 3, 4):
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            entries[tag] = (struct.unpack_from(endian + fmt, data, vpos)[0]
                            if count >= 1 else None)
        else:
            entries[tag] = None
    (nxt,) = struct.unpack_from(endian + "I", data, end)
    return entries, nxt


def _tiff_endian(data: bytes) -> str:
    if len(data) < 8:
        raise ValueError("TIFF: shorter than the 8-byte header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"TIFF: bad byte-order mark {data[:2]!r}")
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic != 42:
        raise ValueError(f"TIFF: magic {magic} != 42")
    return endian


@quarantine("tiff")
def parse_tiff(data: bytes) -> dict:
    """→ byte_order ('II'|'MM'), width, height, bits_per_sample,
    compression, photometric, orientation, samples_per_pixel, n_ifds.
    Walks the whole IFD chain (multi-page TIFFs count pages) with a
    cycle guard; census fields come from IFD0. Raises ValueError for
    non-TIFF bytes."""
    endian = _tiff_endian(data)
    (off,) = struct.unpack_from(endian + "I", data, 4)
    first: dict | None = None
    seen: set[int] = set()
    n_ifds = 0
    while off:
        if off in seen:
            raise ValueError("TIFF: IFD chain cycle")
        seen.add(off)
        entries, off = _read_ifd(data, off, endian)
        if first is None:
            first = entries
        n_ifds += 1
    if first is None:
        raise ValueError("TIFF: no IFD")
    return {
        "byte_order": "II" if endian == "<" else "MM",
        "width": first.get(_TAG_WIDTH),
        "height": first.get(_TAG_HEIGHT),
        "bits_per_sample": first.get(_TAG_BITS),
        "compression": first.get(_TAG_COMPRESSION),
        "photometric": first.get(_TAG_PHOTOMETRIC),
        "orientation": first.get(_TAG_ORIENTATION, 1),
        "samples_per_pixel": first.get(_TAG_SAMPLES, 1),
        "n_ifds": n_ifds,
    }


@quarantine("exif")
def parse_exif(data: bytes) -> dict:
    """JPEG bytes → camera metadata from the APP1 Exif segment:
    orientation, make, model, datetime_original (None when the tag —
    or the whole segment — is absent; has_exif records which). The
    marker walk stops at SOS/EOI; Exif offsets resolve against the
    embedded TIFF header per CIPA DC-008."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("Exif: not a JPEG (no SOI)")
    out = {"has_exif": False, "orientation": None, "make": None,
           "model": None, "datetime_original": None}
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"Exif: bad marker byte at {pos}")
        # JPEG B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them instead of misreading one as a length.
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: metadata is all before
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            raise ValueError("Exif: segment overruns the file")
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10:pos + 2 + seg_len]
            endian = _tiff_endian(tiff)
            (off,) = struct.unpack_from(endian + "I", tiff, 4)
            ifd0, _ = _read_ifd(tiff, off, endian)
            out["has_exif"] = True
            out["orientation"] = ifd0.get(_TAG_ORIENTATION)
            out["make"] = ifd0.get(_TAG_MAKE)
            out["model"] = ifd0.get(_TAG_MODEL)
            sub = ifd0.get(_TAG_EXIF_IFD)
            if isinstance(sub, int) and sub:
                exif_ifd, _ = _read_ifd(tiff, sub, endian)
                out["datetime_original"] = exif_ifd.get(
                    _TAG_DATETIME_ORIGINAL)
            return out
        pos += 2 + seg_len
    return out


# --------------------------------------------------------------- writers

def _pack_ifd(entries: list[tuple[int, int, int, bytes]], endian: str,
              ifd_off: int, next_off: int = 0) -> bytes:
    """entries: (tag, type, count, value_bytes) with value_bytes
    already sized; >4-byte values appended after the table and
    pointed at. Tags must be pre-sorted (TIFF requires ascending)."""
    n = len(entries)
    table = struct.pack(endian + "H", n)
    heap = b""
    heap_base = ifd_off + 2 + 12 * n + 4
    for tag, typ, count, vb in entries:
        if len(vb) <= 4:
            inline = vb + bytes(4 - len(vb))
            table += struct.pack(endian + "HHI", tag, typ, count) + inline
        else:
            table += struct.pack(endian + "HHI", tag, typ, count)
            table += struct.pack(endian + "I", heap_base + len(heap))
            heap += vb
    return table + struct.pack(endian + "I", next_off) + heap


def to_tiff_bytes(
    width: int, height: int, bits_per_sample: int = 8,
    compression: int = 1, photometric: int = 1, orientation: int = 1,
    samples_per_pixel: int = 1, byte_order: str = "II", n_pages: int = 1,
) -> bytes:
    """Fixture/export half: a valid minimal TIFF — header + ``n_pages``
    chained IFDs carrying the census tags (strip data is deterministic
    filler; the triage never reads it)."""
    endian = "<" if byte_order == "II" else ">"
    s = struct.Struct(endian + "H")

    def short(v: int) -> bytes:
        return s.pack(v)

    pages = []
    off = 8
    for p in range(n_pages):
        entries = [
            (_TAG_WIDTH, 3, 1, short(width)),
            (_TAG_HEIGHT, 3, 1, short(height)),
            (_TAG_BITS, 3, 1, short(bits_per_sample)),
            (_TAG_COMPRESSION, 3, 1, short(compression)),
            (_TAG_PHOTOMETRIC, 3, 1, short(photometric)),
            (_TAG_ORIENTATION, 3, 1, short(orientation)),
            (_TAG_SAMPLES, 3, 1, short(samples_per_pixel)),
        ]
        body = _pack_ifd(entries, endian, off, 0)
        pages.append((off, entries, len(body)))
        off += len(body)
    # second pass: chain next-IFD offsets now that sizes are known
    blobs = []
    for i, (ifd_off, entries, size) in enumerate(pages):
        nxt = pages[i + 1][0] if i + 1 < len(pages) else 0
        blobs.append(_pack_ifd(entries, endian, ifd_off, nxt))
    header = (b"II" if byte_order == "II" else b"MM") + struct.pack(
        endian + "HI", 42, 8)
    return header + b"".join(blobs)


def to_jpeg_exif_bytes(
    orientation: int = 1, make: str = "FixtureCam", model: str = "FX-1",
    datetime_original: str = "2024:05:01 12:00:00",
) -> bytes:
    """Fixture half: minimal JPEG (SOI + APP1/Exif + EOI) whose
    embedded TIFF carries Make/Model/Orientation in IFD0 and
    DateTimeOriginal in the Exif sub-IFD — offsets relative to the
    TIFF header per spec."""
    endian = "<"
    make_b = make.encode("ascii") + b"\0"
    model_b = model.encode("ascii") + b"\0"
    dto_b = datetime_original.encode("ascii") + b"\0"
    # IFD0 at offset 8: 4 entries
    ifd0_entries = [
        (_TAG_MAKE, 2, len(make_b), make_b),
        (_TAG_MODEL, 2, len(model_b), model_b),
        (_TAG_ORIENTATION, 3, 1, struct.pack(endian + "H", orientation)),
    ]
    # compute IFD0 size with the exif-pointer entry included
    n0 = len(ifd0_entries) + 1
    ifd0_end = 8 + 2 + 12 * n0 + 4
    heap0 = b"".join(vb for _, _, _, vb in ifd0_entries if len(vb) > 4)
    exif_ifd_off = ifd0_end + len(heap0)
    entries = sorted(
        ifd0_entries
        + [(_TAG_EXIF_IFD, 4, 1, struct.pack(endian + "I", exif_ifd_off))]
    )
    ifd0 = _pack_ifd(entries, endian, 8, 0)
    sub = _pack_ifd([(_TAG_DATETIME_ORIGINAL, 2, len(dto_b), dto_b)],
                    endian, exif_ifd_off, 0)
    tiff = b"II" + struct.pack(endian + "HI", 42, 8) + ifd0 + sub
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"
