"""Compressed-container triage (public RFC 1952 gzip + RFC 8878 zstd):
member/frame headers read WITHOUT inflating a byte — mtime, embedded
filename, OS tag and ISIZE trailer for gzip; frame content size,
window, dictionary id, checksum flag and a full block walk for zstd.
Crawl dumps arrive gzip'd (WARC.gz members) and lake-era rewrites
arrive zstd'd; this is the routing read that decides decompressor and
split strategy before any distributed scan.

The zstd writer half emits RFC-legal frames out of Raw/RLE blocks only
(no entropy coding needed — RFC 8878 §3.1.1.2 makes both first-class
block types), so the parser is exercised on spec-complete frames with
no external codec in the container. Gzip parse is additionally checked
against stdlib-written members in tests.

Spark shape: constant-time per-blob header read, zero shuffle.

Reference note: the reference engine never touches compressed blobs
(SURVEY §1.1); north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import struct
import zlib

from wc_vector_indexing_spark.operators.contract import quarantine

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16

_GZIP_OS = {
    0: "fat", 1: "amiga", 2: "vms", 3: "unix", 4: "vm/cms", 5: "atari",
    6: "hpfs", 7: "macintosh", 8: "z-system", 9: "cp/m", 10: "tops-20",
    11: "ntfs", 12: "qdos", 13: "acorn", 255: "unknown",
}


@quarantine("gzip")
def parse_gzip_member(data: bytes) -> dict:
    """→ mtime, os, fname, ftext, isize (RFC 1952 trailer: uncompressed
    size mod 2^32). Header-and-trailer read only; the deflate payload is
    never inflated. Raises ValueError for non-gzip/truncated bytes."""
    if len(data) < 18 or data[:2] != b"\x1f\x8b":
        raise ValueError("gzip: missing 1f 8b magic")
    if data[2] != 8:
        raise ValueError(f"gzip: unknown compression method {data[2]}")
    flg = data[3]
    mtime = struct.unpack("<I", data[4:8])[0]
    os_byte = data[9]
    pos = 10
    if flg & _FEXTRA:
        if pos + 2 > len(data):
            raise ValueError("gzip: truncated FEXTRA")
        xlen = struct.unpack("<H", data[pos : pos + 2])[0]
        pos += 2 + xlen
    fname = None
    if flg & _FNAME:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise ValueError("gzip: unterminated FNAME")
        fname = data[pos:end].decode("latin-1")
        pos = end + 1
    if flg & _FCOMMENT:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise ValueError("gzip: unterminated FCOMMENT")
        pos = end + 1
    if flg & _FHCRC:
        pos += 2
    if pos + 8 > len(data):
        raise ValueError("gzip: header overruns the member")
    return {
        "mtime": mtime,
        "os": _GZIP_OS.get(os_byte, str(os_byte)),
        "fname": fname,
        "ftext": bool(flg & _FTEXT),
        "isize": struct.unpack("<I", data[-4:])[0],
    }


def to_gzip_bytes(
    payload: bytes,
    mtime: int = 0,
    fname: str | None = None,
    os_byte: int = 3,
    ftext: bool = False,
) -> bytes:
    """Writer half: a spec-complete single-member gzip file (raw-deflate
    body via zlib, header fields hand-laid so every FLG path is
    plantable — stdlib GzipFile can't set the OS byte or FTEXT)."""
    flg = (_FTEXT if ftext else 0) | (_FNAME if fname is not None else 0)
    head = b"\x1f\x8b\x08" + bytes([flg]) + struct.pack("<I", mtime)
    head += b"\x00" + bytes([os_byte])
    if fname is not None:
        head += fname.encode("latin-1") + b"\x00"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    tail = struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    return head + body + tail


_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


@quarantine("zstd")
def parse_zstd_frame(data: bytes) -> dict:
    """→ content_size (None when the FCS field is absent), window_log
    (None for single-segment frames), dict_id (None when absent),
    has_checksum, single_segment, n_blocks, decoded_size (exact sum
    over Raw/RLE blocks; None as soon as a compressed block appears —
    triage never entropy-decodes). Raises ValueError for non-zstd or
    truncated frames (RFC 8878 §3.1.1)."""
    if len(data) < 6 or data[:4] != _ZSTD_MAGIC:
        raise ValueError("zstd: missing frame magic")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ValueError("zstd: reserved FHD bit set")
    has_checksum = bool(fhd & 0x04)
    did_flag = fhd & 0x03
    pos = 5
    window_log = None
    window_size = None
    if not single_segment:
        wd = data[pos]
        pos += 1
        # Window_Size = (1 << (10+exp)) + (mantissa << (10+exp-3));
        # window_log is a floor — the exact size (mantissa included) is
        # what buffer sizing must use.
        exp = wd >> 3
        window_log = 10 + exp
        window_size = (1 << (10 + exp)) + ((wd & 7) << (7 + exp))
    dict_id = None
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(data):
            raise ValueError("zstd: truncated dictionary id")
        dict_id = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise ValueError("zstd: truncated frame content size")
        content_size = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        pos += fcs_size
    n_blocks = 0
    decoded_size: int | None = 0
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        head = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = head & 1, (head >> 1) & 3, head >> 3
        n_blocks += 1
        if btype == 0:  # Raw_Block: bsize literal bytes
            if pos + bsize > len(data):
                raise ValueError("zstd: raw block overruns the frame")
            if decoded_size is not None:
                decoded_size += bsize
            pos += bsize
        elif btype == 1:  # RLE_Block: one byte, repeated bsize times
            if pos + 1 > len(data):
                raise ValueError("zstd: truncated RLE block")
            if decoded_size is not None:
                decoded_size += bsize
            pos += 1
        elif btype == 2:  # Compressed_Block: skip, size exact
            if pos + bsize > len(data):
                raise ValueError("zstd: compressed block overruns the frame")
            decoded_size = None
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if has_checksum and pos + 4 > len(data):
        raise ValueError("zstd: truncated content checksum")
    return {
        "content_size": content_size,
        "window_log": window_log,
        "window_size": window_size,
        "dict_id": dict_id,
        "has_checksum": has_checksum,
        "single_segment": single_segment,
        "n_blocks": n_blocks,
        "decoded_size": decoded_size,
    }


def to_zstd_frame_bytes(
    content: bytes,
    block_size: int = 64,
    single_segment: bool = False,
    with_fcs: bool = True,
    dict_id: int | None = None,
    checksum: bool = False,
    window_log: int = 20,
    rle_byte: int | None = None,
) -> bytes:
    """Writer half: an RFC 8878-legal frame from Raw blocks (or one RLE
    block when rle_byte is set). The checksum field, when requested, is
    a placeholder — triage reports the flag, it never verifies (that's
    the inflater's job)."""
    did_flag = 0
    did_bytes = b""
    if dict_id is not None:
        did_flag = 3 if dict_id > 0xFFFF else (2 if dict_id > 0xFF else 1)
        did_bytes = dict_id.to_bytes((1, 2, 4)[did_flag - 1], "little")
    fcs_flag = 0
    fcs_bytes = b""
    if with_fcs:
        n = len(content)
        if single_segment and n <= 0xFF:
            fcs_flag, fcs_bytes = 0, bytes([n])
        elif 256 <= n <= 65791:
            fcs_flag, fcs_bytes = 1, struct.pack("<H", n - 256)
        else:
            fcs_flag, fcs_bytes = 2, struct.pack("<I", n)
    elif single_segment:
        raise ValueError("single-segment frames must carry an FCS")
    fhd = (
        (fcs_flag << 6)
        | (0x20 if single_segment else 0)
        | (0x04 if checksum else 0)
        | did_flag
    )
    out = bytearray(_ZSTD_MAGIC)
    out.append(fhd)
    if not single_segment:
        out.append((window_log - 10) << 3)
    out += did_bytes + fcs_bytes
    if rle_byte is not None:
        out += ((len(content) << 3) | (1 << 1) | 1).to_bytes(3, "little")
        out.append(rle_byte)
    else:
        chunks = [
            content[i : i + block_size]
            for i in range(0, len(content), block_size)
        ] or [b""]
        for i, chunk in enumerate(chunks):
            last = 1 if i == len(chunks) - 1 else 0
            out += ((len(chunk) << 3) | last).to_bytes(3, "little")
            out += chunk
    if checksum:
        out += bytes(4)
    return bytes(out)
