"""AAC ADTS frame-HEADER parsing: duration, bitrate, profile and
channel metadata for the second-dominant crawl audio format — WITHOUT
decoding (filterbank/Huffman stays behind the ``decode_audio`` seam,
exactly the operators/mp3.py posture: headers alone give everything
triage and census need).

Everything here is the public ISO/IEC 13818-7 / 14496-3 ADTS grammar:
12-bit syncword, the 2-bit profile field (Main/LC/SSR/LTP), the
published 13-entry sampling-frequency-index table, 3-bit channel
configuration, the 13-bit aac_frame_length that frames the walk, and
1024 PCM samples per raw data block.

Spark shape: header walks are per-blob, embarrassingly parallel — the
census query runs them in one zero-shuffle Arrow pass exactly like the
MP3/image/WAV renders in ``media_format_census``.

Reference note: the reference engine has no audio path (SURVEY §1.1);
this is north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

from wc_vector_indexing_spark.operators.contract import quarantine

# ISO 14496-3 Table 1.18 (13818-7 Table 35): samplingFrequencyIndex
SAMPLE_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000,
]
PROFILES = ["main", "lc", "ssr", "ltp"]  # 2-bit profile (audioObjectType-1)

_SAMPLES_PER_BLOCK = 1024


@quarantine("adts")
def parse_adts_headers(data: bytes) -> dict:
    """Walk ADTS frames; returns n_frames, duration_us (exact integer
    µs from total raw-data-block samples over the sample rate),
    avg_bitrate_kbps (total bytes over exact duration), sample_rate,
    channels, profile. Raises ValueError when no valid frame exists or
    parameters change mid-stream (spec requires them constant)."""
    pos = 0
    n_frames = 0
    n_blocks = 0
    total_bytes = 0
    sample_rate = None
    channels = None
    profile = None
    while pos + 7 <= len(data):
        h = data[pos : pos + 7]
        if not (h[0] == 0xFF and (h[1] & 0xF0) == 0xF0):
            raise ValueError("ADTS: lost sync mid-stream")
        if (h[1] & 0x06) != 0:  # layer must be 00
            raise ValueError("ADTS: nonzero layer bits")
        prot_absent = h[1] & 0x01
        prof = (h[2] >> 6) & 0x03
        sfi = (h[2] >> 2) & 0x0F
        if sfi >= len(SAMPLE_RATES):
            raise ValueError(f"ADTS: reserved sampling_frequency_index {sfi}")
        chan = ((h[2] & 0x01) << 2) | ((h[3] >> 6) & 0x03)
        frame_len = ((h[3] & 0x03) << 11) | (h[4] << 3) | ((h[5] >> 5) & 0x07)
        rdb = (h[6] & 0x03) + 1  # number_of_raw_data_blocks_in_frame + 1
        hdr_len = 7 if prot_absent else 9
        if frame_len < hdr_len or pos + frame_len > len(data):
            raise ValueError("ADTS: frame length overruns the stream")
        cur = (SAMPLE_RATES[sfi], chan, prof)
        if sample_rate is None:
            sample_rate, channels, profile = cur
        elif (sample_rate, channels, profile) != cur:
            raise ValueError("ADTS: stream parameters changed mid-stream")
        n_frames += 1
        n_blocks += rdb
        total_bytes += frame_len
        pos += frame_len
    if n_frames == 0:
        raise ValueError("ADTS: no frames found")
    if pos != len(data):
        raise ValueError("ADTS: trailing bytes after last frame")
    duration_us = n_blocks * _SAMPLES_PER_BLOCK * 1_000_000 // sample_rate
    avg_kbps = total_bytes * 8 * 1000 // max(duration_us, 1)
    return {
        "n_frames": n_frames,
        "duration_us": duration_us,
        "avg_bitrate_kbps": avg_kbps,
        "sample_rate": sample_rate,
        "channels": channels,
        "profile": PROFILES[profile],
    }


def to_adts_bytes(
    n_frames: int,
    payload_len: int,
    sfi: int = 4,
    channels: int = 2,
    profile: int = 1,
    crc: bool = False,
) -> bytes:
    """Fixture/export half (the to_mp3_bytes pattern): structurally
    valid ADTS framing around opaque payload bytes — headers are real,
    raw_data_blocks are deterministic filler (parsers that stop at the
    header boundary, like ours, never look inside)."""
    if not 0 <= sfi < len(SAMPLE_RATES):
        raise ValueError("sfi out of range")
    out = bytearray()
    hdr_len = 9 if crc else 7
    frame_len = hdr_len + payload_len
    if frame_len >= 1 << 13:
        raise ValueError("frame too long for the 13-bit length field")
    for k in range(n_frames):
        h = bytearray(hdr_len)
        h[0] = 0xFF
        h[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
        h[2] = (profile << 6) | (sfi << 2) | ((channels >> 2) & 0x01)
        h[3] = ((channels & 0x03) << 6) | ((frame_len >> 11) & 0x03)
        h[4] = (frame_len >> 3) & 0xFF
        h[5] = ((frame_len & 0x07) << 5) | 0x1F  # buffer fullness high bits
        h[6] = 0xFC | 0x00  # fullness low, 1 raw data block (field = 0)
        if crc:
            h[7] = h[8] = 0
        out += h
        out += bytes((k + j) % 251 for j in range(payload_len))
    return bytes(out)
