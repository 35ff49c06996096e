"""MP3 (MPEG-1/2/2.5 Layer I-III) frame-HEADER parsing: duration,
bitrate, sample-rate metadata for the dominant real-world crawl audio
format — WITHOUT decoding (Huffman/IMDCT stays behind the
``decode_audio`` seam; headers alone give everything triage and census
need, which is how real ingest pipelines cost audio before deciding to
transcode).

Everything here is the public ISO 11172-3 / 13818-3 frame grammar:
11-bit sync, version/layer bits, the published bitrate and sample-rate
tables, and the frame-length recurrences. ID3v2 prologue tags are
skipped by their syncsafe length; ID3v1 trailers and up-to-2-byte
resync gaps are tolerated (streams ripped mid-broadcast rarely start
on a frame boundary).

Spark shape: header walks are per-blob, embarrassingly parallel — the
census query runs them in one zero-shuffle Arrow pass exactly like the
image/WAV renders in ``media_format_census``.

Reference note: the reference engine has no audio path (SURVEY §1.1);
this is north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

# bitrate tables in kbps, index 1..14 (0 = free-format, 15 = invalid) —
# ISO 11172-3 table B.2 / ISO 13818-3
_BITRATE_KBPS = {
    # (version_group, layer): 14-entry table; version_group: 1 = MPEG1,
    # 2 = MPEG2/2.5 (they share tables for layers II+III)
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATE = {
    # version bits (00=2.5, 10=2, 11=1) → 3-entry table
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}

# samples per frame: (version_group, layer)
_SPF = {
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none): 'ID3' + ver(2)
    + flags(1) + 4-byte syncsafe size, then the tag body."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for byte in data[6:10]:
        if byte & 0x80:  # syncsafe bytes keep the high bit clear
            return 0
        size = (size << 7) | byte
    return 10 + size


def _frame_at(data: bytes, i: int) -> tuple[int, int, int, int] | None:
    """Parse a frame header at offset i → (frame_len, bitrate_kbps,
    sample_rate, samples_per_frame), or None if not a valid header."""
    if i + 4 > len(data):
        return None
    b1, b2, b3 = data[i], data[i + 1], data[i + 2]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version_bits = (b2 >> 3) & 0x03
    layer_bits = (b2 >> 1) & 0x03
    if version_bits == 1 or layer_bits == 0:  # reserved
        return None
    layer = 4 - layer_bits  # 11→I(1), 10→II(2), 01→III(3)
    vgroup = 1 if version_bits == 3 else 2
    br_idx = (b3 >> 4) & 0x0F
    sr_idx = (b3 >> 2) & 0x03
    padding = (b3 >> 1) & 0x01
    if br_idx in (0, 15) or sr_idx == 3:  # free-format/invalid
        return None
    kbps = _BITRATE_KBPS[(vgroup, layer)][br_idx - 1]
    rate = _SAMPLE_RATE[version_bits][sr_idx]
    if layer == 1:
        frame_len = (12000 * kbps // rate + padding) * 4
    else:
        spf = _SPF[(vgroup, layer)]
        # 144 = 1152/8 for MPEG1 L3/L2; 72 = 576/8 for MPEG2/2.5 L3
        frame_len = spf // 8 * 1000 * kbps // rate + padding
    return frame_len, kbps, rate, _SPF[(vgroup, layer)]


def parse_xing_header(data: bytes, frame_start: int) -> dict | None:
    """Xing/Info VBR header in the FIRST frame's side-info region (the
    de-facto public spec every encoder follows): returns {tag, n_frames,
    n_bytes, has_toc, quality} or None. ``tag`` distinguishes 'Xing'
    (VBR) from 'Info' (CBR written by LAME). The header sits after the
    4-byte frame header + side info (32 bytes mono... 17 mono / 32
    stereo for MPEG-1; 9/17 for MPEG-2)."""
    if frame_start + 4 > len(data):
        return None
    b2, b3 = data[frame_start + 1], data[frame_start + 3]
    version_bits = (b2 >> 3) & 0x03
    mode = (b3 >> 6) & 0x03
    if version_bits == 3:
        side = 17 if mode == 3 else 32
    else:
        side = 9 if mode == 3 else 17
    pos = frame_start + 4 + side
    tag = data[pos:pos + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    flags = int.from_bytes(data[pos + 4:pos + 8], "big")
    pos += 8
    out = {"tag": tag.decode("ascii"), "n_frames": None, "n_bytes": None,
           "has_toc": bool(flags & 4), "quality": None}
    if flags & 1:
        out["n_frames"] = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
    if flags & 2:
        out["n_bytes"] = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
    if flags & 4:
        pos += 100  # seek TOC
    if flags & 8:
        out["quality"] = int.from_bytes(data[pos:pos + 4], "big")
    return out


def parse_mp3_headers(data: bytes, max_resync: int = 2) -> dict:
    """Walk every frame header → {n_frames, duration_us,
    avg_bitrate_kbps, sample_rate, vbr}. ``duration_us`` is exact
    integer arithmetic (Σ samples·10⁶ // rate) so a planted-truth
    oracle can reproduce it bit-for-bit. Raises ValueError when no
    frame parses (not an MP3 / hopelessly corrupt). ``max_resync``
    bounds how many stray bytes may sit between frames before the walk
    stops (tag trailers like ID3v1 end the walk cleanly)."""
    i = _id3v2_size(data)
    n_frames = 0
    total_samples = 0
    rate = None
    kbps_sum = 0
    kbps_seen: set[int] = set()
    xing = None
    n = len(data)
    while i < n:
        fr = _frame_at(data, i)
        if fr is not None and n_frames == 0 and xing is None:
            xing = parse_xing_header(data, i)
        if fr is None:
            # tolerate a tiny resync gap between frames, then stop
            for skip in range(1, max_resync + 1):
                fr = _frame_at(data, i + skip)
                if fr is not None:
                    i += skip
                    break
            if fr is None:
                break
        frame_len, kbps, sr, spf = fr
        if rate is None:
            rate = sr
        elif sr != rate:
            break  # sample-rate change = not the same stream; stop
        n_frames += 1
        total_samples += spf
        kbps_sum += kbps
        kbps_seen.add(kbps)
        i += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frame found (not an MP3?)")
    return {
        "n_frames": n_frames,
        "duration_us": total_samples * 1_000_000 // rate,
        "avg_bitrate_kbps": kbps_sum // n_frames,
        "sample_rate": rate,
        "vbr": len(kbps_seen) > 1,
        # Xing/Info header from the first frame when present — n_frames
        # above still counts the raw walked frames (the Xing frame
        # itself carries no audio; callers wanting playable duration use
        # xing["n_frames"] when set)
        "xing": xing,
    }


_ID3V22_TEXT = {  # v2.2 3-char ids -> the v2.3/2.4 names callers key on
    "TT2": "TIT2", "TP1": "TPE1", "TAL": "TALB", "TRK": "TRCK",
    "TYE": "TYER", "TCO": "TCON",
}


def parse_id3v2_text(data: bytes) -> dict[str, str]:
    """Text frames from a leading ID3v2.2/2.3/2.4 tag (the id3.org
    public spec): {frame_id: value} for T*** frames — TIT2 title, TPE1
    artist, TALB album, etc. Empty dict when no tag exists. Handles
    all three frame-header flavors (v2.2 3-char ids + 3-byte sizes,
    translated to their v2.3 names; v2.3 plain 32-bit sizes; v2.4
    syncsafe sizes) and text encodings 0 (latin-1), 1 (UTF-16 w/ BOM),
    2 (UTF-16BE) and 3 (UTF-8); undecodable frames are skipped, not
    fatal — tag metadata is advisory, the frame walk is the ground
    truth."""
    total = _id3v2_size(data)
    if total == 0:
        return {}
    version = data[3]
    out: dict[str, str] = {}
    i = 10
    head_len = 6 if version == 2 else 10
    while i + head_len <= total:
        if version == 2:
            fid3 = data[i : i + 3]
            if not fid3.strip(b"\x00"):
                break
            size = int.from_bytes(data[i + 3 : i + 6], "big")
            body = data[i + 6 : i + 6 + size]
            i += 6 + size
            name = fid3.decode("ascii", "replace")
            fid = _ID3V22_TEXT.get(name, name).encode("ascii")
        else:
            fid = data[i : i + 4]
            if not fid.strip(b"\x00"):
                break  # zero padding reached
            raw = data[i + 4 : i + 8]
            if version >= 4:
                size = 0
                for byte in raw:
                    size = (size << 7) | (byte & 0x7F)
            else:
                size = int.from_bytes(raw, "big")
            body = data[i + 10 : i + 10 + size]
            i += 10 + size
        if not fid.startswith(b"T") or not body:
            continue
        enc, text = body[0], body[1:]
        try:
            if enc == 0:
                val = text.decode("latin-1")
            elif enc == 1:
                val = text.decode("utf-16")
            elif enc == 2:
                val = text.decode("utf-16-be")
            elif enc == 3:
                val = text.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        out[fid.decode("ascii")] = val.rstrip("\x00")
    return out


def to_mp3_bytes(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3_comment: bytes | None = None,
    id3_text: dict[str, str] | None = None,
    xing_tag: str | None = None,
) -> bytes:
    """Serialize a structurally-valid CBR MPEG-1 Layer III stream:
    correct frame headers with zeroed payloads (header walkers — this
    module, ffprobe — read it fine; it decodes as silence-ish garbage,
    which is irrelevant for header fixtures). Optional ID3v2 prologue
    exercises the tag skip. The fixture half of the parse_mp3_headers
    roundtrip, same writer-inverse pattern as to_pdf_bytes."""
    sr_table = _SAMPLE_RATE[3]
    if sample_rate not in sr_table:
        raise ValueError(f"MPEG-1 sample rate must be one of {sr_table}")
    br_table = _BITRATE_KBPS[(1, 3)]
    if bitrate_kbps not in br_table:
        raise ValueError(f"bitrate must be one of {br_table}")
    sr_idx = sr_table.index(sample_rate)
    br_idx = br_table.index(bitrate_kbps) + 1
    out = bytearray()
    if id3_comment is not None or id3_text:
        body = b""
        if id3_comment is not None:
            csize = len(id3_comment)
            body += (
                b"COMM"
                + bytes([(csize >> 21) & 0x7F, (csize >> 14) & 0x7F,
                         (csize >> 7) & 0x7F, csize & 0x7F])  # v2.4 syncsafe
                + b"\x00\x00" + id3_comment
            )
        for fid, val in (id3_text or {}).items():
            payload = b"\x03" + val.encode("utf-8")
            fsize = len(payload)
            fsyncsafe = bytes(
                [(fsize >> 21) & 0x7F, (fsize >> 14) & 0x7F,
                 (fsize >> 7) & 0x7F, fsize & 0x7F]
            )
            body += fid.encode("ascii") + fsyncsafe + b"\x00\x00" + payload
        size = len(body)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + syncsafe + body
    # header: sync FFF, version 11 (MPEG1), layer 01 (III), no CRC (1)
    b2 = 0xE0 | (3 << 3) | (1 << 1) | 1
    frame_len = 144 * 1000 * bitrate_kbps // sample_rate
    if xing_tag is not None:
        if xing_tag not in ("Xing", "Info"):
            raise ValueError("xing_tag must be 'Xing' or 'Info'")
        # leading metadata frame: header + mono side-info zeros + tag +
        # flags(frames|bytes|toc|quality) + fields + 100-byte TOC
        body = bytearray(b"\x00" * 17)
        body += xing_tag.encode("ascii")
        body += (0xF).to_bytes(4, "big")
        body += n_frames.to_bytes(4, "big")
        body += ((n_frames + 1) * frame_len).to_bytes(4, "big")
        body += bytes(min(255, i * 256 // 100) for i in range(100))
        body += (78).to_bytes(4, "big")
        if len(body) > frame_len - 4:
            raise ValueError("bitrate too low to hold a Xing frame")
        b3 = (br_idx << 4) | (sr_idx << 2)
        out += bytes([0xFF, b2, b3, 0xC0])  # mono mode -> 17-byte side
        out += body + b"\x00" * (frame_len - 4 - len(body))
    for _ in range(n_frames):
        b3 = (br_idx << 4) | (sr_idx << 2)  # no padding
        out += bytes([0xFF, b2, b3, 0xC0 if xing_tag else 0x00]) + b"\x00" * (frame_len - 4)
    return bytes(out)
