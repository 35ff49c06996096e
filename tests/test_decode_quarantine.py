"""Corrupt-media isolation (r6 advice): one bad crawled file must not
fail a whole Spark task. Truncated JPEG/PNG surface ValueError (not
bare IndexError / zlib.error), and every decode map pass quarantines
per record under on_error='skip'/'mark' while 'raise' (the default)
still propagates — matching embed.embed_texts' isolation contract."""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_audio import make_wav, sine
from tests.test_video import _avi, _frames
from wc_vector_indexing_spark.operators.jpeg import decode_jpeg, encode_baseline
from wc_vector_indexing_spark.operators.multimodal import (
    StdlibCodec,
    decode_image,
    extract_features,
    image_dhash,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 11) % 256).astype(np.uint8)


def _png_bytes(img):
    from tests.test_png import encode_png  # reuse the fixture encoder

    return encode_png(img)


def test_truncated_jpeg_raises_value_error_not_index_error():
    data = encode_baseline(_gradient(24, 32))
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) - 8])  # cut mid-entropy + EOI


def test_corrupt_png_idat_raises_value_error():
    good = _png_bytes(_gradient(16, 16))
    # flip bytes inside the IDAT payload: zlib.error must not leak
    bad = bytearray(good)
    i = good.find(b"IDAT") + 8
    bad[i : i + 4] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def _image_media(spark):
    rows = [
        (1, "image", bytearray(encode_baseline(_gradient(24, 32)))),
        (2, "image", bytearray(encode_baseline(_gradient(24, 32))[:40])),  # corrupt
        (3, "image", bytearray(_png_bytes(_gradient(16, 16)))),
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, content binary")


def test_image_dhash_default_raises_skip_quarantines(spark):
    media = _image_media(spark)
    with pytest.raises(Exception):
        image_dhash(media).collect()
    got = sorted(r.media_id for r in image_dhash(media, on_error="skip").collect())
    assert got == [1, 3]


def test_extract_features_mark_and_skip(spark):
    media = _image_media(spark)
    marked = extract_features(
        media, codec=StdlibCodec(), on_error="mark"
    ).collect()
    by_id = {r.media_id: r for r in marked}
    assert by_id[1].decode_error is None and by_id[1].features is not None
    assert by_id[2].features is None and "ValueError" in by_id[2].decode_error
    skipped = extract_features(media, codec=StdlibCodec(), on_error="skip")
    assert sorted(r.media_id for r in skipped.collect()) == [1, 3]
    assert "decode_error" not in skipped.columns


def test_audio_passes_skip_corrupt_wav(spark):
    from wc_vector_indexing_spark.operators.audio import (
        audio_features,
        audio_fingerprint,
    )

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(make_wav(sine(440)))),
            (2, "audio", bytearray(b"RIFFgarbage-not-a-wav")),
            (3, "audio", bytearray(make_wav(sine(900)))),
        ],
        "media_id long, kind string, content binary",
    )
    with pytest.raises(Exception):
        audio_fingerprint(media).collect()
    assert sorted(
        r.media_id for r in audio_fingerprint(media, on_error="skip").collect()
    ) == [1, 3]
    assert sorted(
        r.media_id for r in audio_features(media, on_error="skip").collect()
    ) == [1, 3]


def test_video_frame_hashes_skip_drops_whole_corrupt_video(spark):
    from wc_vector_indexing_spark.operators.video import video_frame_hashes

    good = _avi(_frames(3, seed=1))
    # corrupt one frame mid-stream: the whole video must be dropped
    # (a partial frame set would alias as a different video downstream)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(good)),
            (2, "video", bytearray(good[: len(good) // 2])),
        ],
        "media_id long, kind string, content binary",
    )
    with pytest.raises(Exception):
        video_frame_hashes(media).collect()
    got = video_frame_hashes(media, on_error="skip").collect()
    assert sorted({r.media_id for r in got}) == [1]
    assert len(got) == 3
