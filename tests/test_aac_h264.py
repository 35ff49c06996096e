"""ADTS AAC and H.264 Annex B triage (operators/aac.py, operators/
h264.py): writer-inverse roundtrips over the parameter grid, exact
duration arithmetic, CRC headers, high-profile SPS with scaling lists
and crop arithmetic, emulation-prevention handling, and corrupt-stream
ValueError quarantine (the media decode-error contract)."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.aac import (
    SAMPLE_RATES,
    parse_adts_headers,
    to_adts_bytes,
)
from wc_vector_indexing_spark.operators.bmp_gif import sniff_format
from wc_vector_indexing_spark.operators.h264 import (
    _add_emulation,
    _strip_emulation,
    parse_annexb,
    parse_sps,
    to_annexb_bytes,
)


# ------------------------------------------------------------------- AAC
@pytest.mark.parametrize("sfi", range(12))
def test_adts_roundtrip_all_rates(sfi):
    m = parse_adts_headers(to_adts_bytes(6, 80, sfi=sfi, channels=2, profile=1))
    assert m["sample_rate"] == SAMPLE_RATES[sfi]
    assert m["n_frames"] == 6
    assert m["duration_us"] == 6 * 1024 * 1_000_000 // SAMPLE_RATES[sfi]


@pytest.mark.parametrize("profile,name", [(0, "main"), (1, "lc"), (2, "ssr"), (3, "ltp")])
def test_adts_profiles(profile, name):
    m = parse_adts_headers(to_adts_bytes(2, 30, profile=profile))
    assert m["profile"] == name


def test_adts_crc_header_framing():
    """protection_absent=0 adds a 2-byte CRC the frame length covers."""
    m = parse_adts_headers(to_adts_bytes(5, 64, crc=True))
    assert m["n_frames"] == 5


def test_adts_bitrate_is_bytes_over_exact_duration():
    data = to_adts_bytes(10, 100, sfi=4)
    m = parse_adts_headers(data)
    assert m["avg_bitrate_kbps"] == len(data) * 8 * 1000 // m["duration_us"]


def test_adts_corrupt_quarantine():
    good = to_adts_bytes(3, 50)
    with pytest.raises(ValueError, match="sync"):
        parse_adts_headers(b"\x12\x34" + good)
    with pytest.raises(ValueError, match="overruns"):
        parse_adts_headers(good[:-10])
    with pytest.raises(ValueError, match="no frames"):
        parse_adts_headers(b"")
    # parameter change mid-stream (spec: constant per stream)
    mixed = to_adts_bytes(2, 50, sfi=4) + to_adts_bytes(2, 50, sfi=7)
    with pytest.raises(ValueError, match="changed"):
        parse_adts_headers(mixed)


# ------------------------------------------------------------------ H264
def test_annexb_roundtrip_baseline():
    v = parse_annexb(to_annexb_bytes(40, 30, 5))
    assert v == {
        "n_nals": 7, "n_slices": 5, "profile_idc": 66, "level_idc": 30,
        "width": 640, "height": 480,
    }


def test_annexb_high_profile_with_crop():
    v = parse_annexb(
        to_annexb_bytes(120, 68, 4, profile_idc=100, level_idc=41,
                        crop_right=4, crop_bottom=4)
    )
    # 1920x1088 coded, cropped to 1912x1080 (CropUnit 2 in 4:2:0)
    assert (v["width"], v["height"]) == (1920 - 8, 1088 - 8)
    assert v["profile_idc"] == 100 and v["level_idc"] == 41


def test_emulation_prevention_roundtrip():
    for payload in (b"\x00\x00\x00\x00", b"\x00\x00\x01\x02", b"ab\x00\x00\x03x"):
        assert _strip_emulation(_add_emulation(payload)) == payload
    # an SPS whose RBSP contains 00 00 0x must survive the byte stream:
    # width_mbs=257 makes pic_width ue() emit long zero runs
    v = parse_annexb(to_annexb_bytes(256, 2, 1))
    assert v["width"] == 256 * 16


def test_sps_rejects_garbage():
    with pytest.raises(ValueError):
        parse_annexb(b"no start code here")
    with pytest.raises(ValueError, match="SPS"):
        parse_annexb(b"\x00\x00\x01\x41abc")  # slice only, no SPS
    with pytest.raises(ValueError, match="forbidden"):
        parse_annexb(b"\x00\x00\x01\xff\x00")


def test_sps_truncated_raises_valueerror_not_indexerror():
    """The decode-quarantine contract promises ValueError for any
    untriageable stream — a truncated SPS must not escape as
    IndexError from the bit reader."""
    data = to_annexb_bytes(40, 30, 2)
    for cut in (5, 6, 8, 10):
        with pytest.raises(ValueError):
            parse_annexb(data[:cut])


def test_sps_parse_is_bit_exact_on_known_fields():
    """parse_sps consumes the exact bit layout: a hand-mutated level
    byte must surface verbatim (catches off-by-one bit reads)."""
    data = to_annexb_bytes(10, 8, 1, level_idc=51)
    assert parse_annexb(data)["level_idc"] == 51


# ------------------------------------------------------------- sniffing
def test_sniff_routes_aac_vs_mp3_vs_h264():
    from wc_vector_indexing_spark.operators.mp3 import to_mp3_bytes

    assert sniff_format(to_adts_bytes(2, 40)) == "aac"
    assert sniff_format(to_mp3_bytes(2, 128, 44100)) == "mp3"
    assert sniff_format(to_annexb_bytes(4, 3, 1)) == "h264"
    assert sniff_format(b"\x00\x00\x00\x01\xff") == "unknown"  # forbidden bit


# ------------------------------------------------------------------- MP4
def test_mp4_roundtrip_and_v1_layout():
    from wc_vector_indexing_spark.operators.mp4 import parse_mp4, to_mp4_bytes

    m = parse_mp4(to_mp4_bytes(125000, 600, 1280, 720, ("avc1", "mp4a")))
    assert m == {
        "brand": "isom", "duration_us": 125000000, "n_tracks": 2,
        "codecs": "avc1,mp4a", "width": 1280, "height": 720,
    }
    # 64-bit v1 mvhd layout, audio-only (no dimensions)
    m1 = parse_mp4(to_mp4_bytes(90061, 90000, codecs=("mp4a",), version1=True))
    assert m1["n_tracks"] == 1 and m1["width"] is None
    assert m1["duration_us"] == (90061 * 90000 // 1000) * 1_000_000 // 90000


def test_mp4_corrupt_quarantine():
    from wc_vector_indexing_spark.operators.mp4 import parse_mp4, to_mp4_bytes

    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"RIFF0000WAVE")
    good = to_mp4_bytes(1000)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(good[:-20])
    # moov present but no mvhd
    broken = good.replace(b"mvhd", b"xxhd")
    with pytest.raises(ValueError, match="mvhd"):
        parse_mp4(broken)


def test_sniff_routes_mp4():
    from wc_vector_indexing_spark.operators.mp4 import to_mp4_bytes

    assert sniff_format(to_mp4_bytes(500)) == "mp4"


# ------------------------------------------------------------------ FLAC
def test_flac_streaminfo_roundtrip():
    from wc_vector_indexing_spark.operators.flac import (
        parse_flac_streaminfo,
        to_flac_bytes,
    )

    m = parse_flac_streaminfo(to_flac_bytes(44100, 2, 16, 441000))
    assert m == {
        "sample_rate": 44100, "channels": 2, "bits_per_sample": 16,
        "total_samples": 441000, "duration_us": 10_000_000,
    }
    # block chain: VORBIS_COMMENT between STREAMINFO and frames
    m2 = parse_flac_streaminfo(
        to_flac_bytes(96000, 8, 24, 123456789, with_vorbis_comment=True)
    )
    assert m2["channels"] == 8 and m2["bits_per_sample"] == 24
    assert m2["duration_us"] == 123456789 * 1_000_000 // 96000
    # total_samples 0 = spec 'unknown' -> NULL duration
    assert parse_flac_streaminfo(to_flac_bytes(8000, 1, 8, 0))["duration_us"] is None


def test_flac_corrupt_quarantine():
    from wc_vector_indexing_spark.operators.flac import (
        parse_flac_streaminfo,
        to_flac_bytes,
    )

    with pytest.raises(ValueError, match="magic"):
        parse_flac_streaminfo(b"OggS....")
    good = to_flac_bytes(44100, 2, 16, 1000)
    with pytest.raises(ValueError, match="overruns"):
        parse_flac_streaminfo(good[:20])


def test_sniff_routes_flac():
    from wc_vector_indexing_spark.operators.flac import to_flac_bytes

    assert sniff_format(to_flac_bytes(44100, 2, 16, 10)) == "flac"
    assert sniff_format(b"OggS\x00\x02rest") == "ogg"


# ------------------------------------------------------------------- Ogg
def test_ogg_opus_and_vorbis_roundtrip():
    from wc_vector_indexing_spark.operators.ogg import parse_ogg, to_ogg_bytes

    m = parse_ogg(to_ogg_bytes("opus", 2, 48000, 48000 * 10 + 312))
    assert m["codec"] == "opus" and m["channels"] == 2
    assert m["duration_us"] == 10_000_000  # pre-skip subtracted, 48k ticks
    v = parse_ogg(to_ogg_bytes("vorbis", 1, 44100, 44100 * 3))
    assert v["codec"] == "vorbis" and v["duration_us"] == 3_000_000
    assert v["n_pages"] == 4 and v["n_streams"] == 1
    # unknown BOS packet: pages counted, no codec metadata
    u = parse_ogg(to_ogg_bytes("junk", 0, 0, 500))
    assert u["codec"] == "unknown" and u["duration_us"] is None


def test_ogg_corrupt_quarantine():
    from wc_vector_indexing_spark.operators.ogg import parse_ogg, to_ogg_bytes

    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(b"fLaC....")
    good = to_ogg_bytes("opus", 2, 48000, 9600)
    with pytest.raises(ValueError, match="overruns|lacing"):
        parse_ogg(good[:-40])
    with pytest.raises(ValueError, match="version"):
        parse_ogg(good[:4] + b"\x63" + good[5:])


# ------------------------------------------------------------------ WebP
def test_webp_all_variants_roundtrip():
    from wc_vector_indexing_spark.operators.webp import parse_webp, to_webp_bytes

    a = parse_webp(to_webp_bytes("vp8", 640, 480))
    assert (a["variant"], a["width"], a["height"]) == ("vp8", 640, 480)
    assert not a["lossless"] and not a["has_alpha"]
    b = parse_webp(to_webp_bytes("vp8l", 16383, 1, has_alpha=True))
    assert b["lossless"] and b["has_alpha"] and b["width"] == 16383
    c = parse_webp(to_webp_bytes("vp8x", 16384, 10000, animated=True))
    assert c["width"] == 16384 and c["animated"]


def test_webp_corrupt_quarantine():
    from wc_vector_indexing_spark.operators.webp import parse_webp, to_webp_bytes

    with pytest.raises(ValueError, match="signature"):
        parse_webp(b"RIFF\x00\x00\x00\x00WAVEdata")
    good = to_webp_bytes("vp8", 64, 64)
    with pytest.raises(ValueError, match="start code"):
        parse_webp(good[:21] + b"\x00\x00\x00" + good[24:])
    with pytest.raises(ValueError, match="overruns"):
        parse_webp(good[:24])


def test_sniff_routes_webp():
    from wc_vector_indexing_spark.operators.webp import to_webp_bytes

    assert sniff_format(to_webp_bytes("vp8l", 8, 8)) == "webp"
