"""Multimodal plumbing: schema, Arrow batch shape, frame explode,
deterministic fake features, decode stub behavior."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeCodec,
    decode_image,
    extract_features,
    media_stats,
    sample_frames,
)


def mk_media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNGfakebytes1", (640, 480, None, None, None)),
        (2, "image", "image/png", b"\x89PNGfakebytes2", (320, 240, None, None, None)),
        (3, "audio", "audio/wav", b"RIFFfakeaudio", (None, None, 30_000, 16_000, None)),
        (4, "video", "video/mp4", b"mp4fakevideo", (1280, 720, 10_000, None, 95)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark):
    media = mk_media(spark)
    out1 = {r.media_id: r.features for r in extract_features(media, dim=16).collect()}
    out2 = {r.media_id: r.features for r in extract_features(media, dim=16).collect()}
    assert out1 == out2
    assert all(len(v) == 16 for v in out1.values())
    assert out1[1] != out1[2]  # different bytes → different features
    # content column dropped from output schema (pruned past the UDF)
    assert "content" not in extract_features(media, dim=16).columns


def test_fake_codec_modality_separation():
    c = FakeCodec()
    img = c.image_features(b"same", 8)
    aud = c.audio_features(b"same", 8)
    assert list(img) != list(aud)


def test_sample_frames_explode(spark):
    frames = sample_frames(mk_media(spark), every_n=10).collect()
    assert {r.frame_no for r in frames} == set(range(0, 95, 10))
    assert all(r.media_id == 4 for r in frames)


def test_media_stats_prunes_content(spark):
    stats = {r.kind: r.n for r in media_stats(mk_media(spark)).collect()}
    assert stats == {"image": 2, "audio": 1, "video": 1}


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")
