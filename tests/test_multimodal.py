"""Multimodal plumbing: schema, Arrow batch shape, frame explode,
deterministic fake features, decode stub behavior."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeCodec,
    decode_audio,
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


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG-not-decodable-here")
    # formats with no in-container decoder stay NotImplementedError...
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS-not-decodable-here")
    # ...but an MP3-magic blob now routes to the real Layer III decoder,
    # whose corrupt-input contract is ValueError (quarantine)
    with pytest.raises(ValueError):
        decode_audio(b"ID3mp3-not-decodable-here")


# --- real stdlib decode: golden-value tests -------------------------------


def _ppm_p6() -> bytes:
    # 2x2 RGB: red, green / blue, white — with a header comment
    return (
        b"P6\n# test comment\n2 2\n255\n"
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    )


def _wav_pcm16(samples, rate=8000, channels=1) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_decode_ppm_golden_pixels():
    import numpy as np

    img = decode_image(_ppm_p6())
    assert img.shape == (2, 2, 3) and img.dtype == np.uint8
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 255]


def test_decode_pgm_binary_16bit_and_ascii():
    import numpy as np

    # P5 16-bit: big-endian per netpbm spec
    p5 = b"P5 2 1 65535\n" + (1000).to_bytes(2, "big") + (64000).to_bytes(2, "big")
    img = decode_image(p5)
    assert img.shape == (1, 2) and img.tolist() == [[1000, 64000]]
    # P2 ASCII with comment
    p2 = b"P2\n# c\n3 1\n255\n0 128 255\n"
    img2 = decode_image(p2)
    assert img2.dtype == np.uint8 and img2.tolist() == [[0, 128, 255]]


def test_decode_wav_golden_samples():
    from wc_vector_indexing_spark.operators.multimodal import decode_audio

    want = [0, 1000, -1000, 32767, -32768]
    samples, rate = decode_audio(_wav_pcm16(want, rate=16000))
    assert rate == 16000
    assert samples.shape == (5, 1)
    assert samples[:, 0].tolist() == want
    # stereo: frames x channels shape
    st, _ = decode_audio(_wav_pcm16([1, 2, 3, 4], channels=2))
    assert st.shape == (2, 2) and st.tolist() == [[1, 2], [3, 4]]


def test_resize_image_nearest():
    import numpy as np

    from wc_vector_indexing_spark.operators.multimodal import resize_image

    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = resize_image(img, (4, 4))
    assert up.shape == (4, 4)
    assert up[0].tolist() == [1, 1, 2, 2] and up[3].tolist() == [3, 3, 4, 4]
    down = resize_image(up, (2, 2))
    assert down.tolist() == img.tolist()


def test_stdlib_codec_features_content_derived(spark):
    """extract_features with the REAL codec: features come from decoded
    pixels/samples, through the same Spark mapInPandas plan."""
    from wc_vector_indexing_spark.operators.multimodal import StdlibCodec

    white = b"P5 1 1 255\n" + bytes([255])
    black = b"P5 1 1 255\n" + bytes([0])
    loud = _wav_pcm16([20000, -20000] * 50)
    rows = [
        (1, "image", "image/x-portable-graymap", white, (1, 1, None, None, None)),
        (2, "image", "image/x-portable-graymap", black, (1, 1, None, None, None)),
        (3, "audio", "audio/wav", loud, (None, None, 12, 8000, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r.features for r in extract_features(media, dim=4, codec=StdlibCodec()).collect()}
    assert out[1][0] == pytest.approx(1.0)  # white pixel → 255/255
    assert out[2][0] == pytest.approx(0.0)  # black pixel
    assert any(v > 0.5 for v in out[3])  # loud RMS envelope near peak-normalised 1


# ------------------------------------------------- perceptual image dedup

def _pgm(pixels) -> bytes:
    """Binary PGM from a 2-D list of 0-255 ints."""
    import numpy as np

    arr = np.array(pixels, dtype=np.uint8)
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _gradient(w, h, shift=0):
    return [[min(255, c * (255 // max(1, w - 1)) + shift) for c in range(w)] for r in range(h)]


def test_dhash_is_brightness_invariant_and_content_sensitive():
    import numpy as np

    from wc_vector_indexing_spark.operators.multimodal import dhash64

    base = np.array(_gradient(16, 16), dtype=np.uint8)
    brighter = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    # gradient-sign structure unchanged → identical hash
    assert dhash64(base) == dhash64(brighter)
    flipped = base[:, ::-1].copy()
    h1, h2 = dhash64(base), dhash64(flipped)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") > 16  # structure reversed


def test_image_near_pairs_finds_resized_duplicate(spark):
    from wc_vector_indexing_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_near_pairs,
    )

    rng_rows = _gradient(32, 32)
    small = _gradient(16, 16)  # same gradient, half resolution
    noise = [[(r * 97 + c * 31) % 256 for c in range(32)] for r in range(32)]
    rows = [
        (1, "image", "image/x-pgm", _pgm(rng_rows), (32, 32, None, None, None)),
        (2, "image", "image/x-pgm", _pgm(small), (16, 16, None, None, None)),
        (3, "image", "image/x-pgm", _pgm(noise), (32, 32, None, None, None)),
        (4, "audio", "audio/wav", b"RIFFnotimage", (None, None, 1, 1, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.media_a, r.media_b): r.hamming for r in image_near_pairs(media, max_hamming=6).collect()}
    assert (1, 2) in pairs  # resized duplicate caught
    assert all(3 not in p for p in pairs)  # unrelated image not paired


def test_cross_format_dedup_pgm_png_jpeg(spark):
    """The format-bridging property real crawl dedup needs: the SAME
    image stored as PGM, PNG, and (near-losslessly) JPEG decodes to the
    same pixels, so dHash pairs them across container formats — re-encoded
    copies of one image are found without any format-aware logic."""
    import numpy as np

    from tests.test_jpeg import encode_baseline
    from tests.test_png import encode_png
    from wc_vector_indexing_spark.operators.multimodal import image_near_pairs

    rng = np.random.RandomState(42)

    def tie_free(seed):
        # 8x9 grid of DISTINCT values spaced >=3 apart: every dHash
        # comparison has margin > the +-1 JPEG roundtrip error, so the
        # hash is identical across lossless and near-lossless encodings
        g = np.random.RandomState(seed).permutation(72).reshape(8, 9) * 3
        return np.kron(g, np.ones((2, 8))).astype(np.uint8)  # 16x72

    img = tie_free(1)
    other = tie_free(2)
    pgm = b"P5\n72 16\n255\n" + img.tobytes()
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(pgm)),
            (2, "image", bytearray(encode_png(img, filters=4))),
            (3, "image", bytearray(encode_baseline(img))),
            (4, "image", bytearray(encode_png(other, filters=1))),
        ],
        "media_id long, kind string, content binary",
    )
    pairs = {(r.media_a, r.media_b): r.hamming
             for r in image_near_pairs(media, max_hamming=4).collect()}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}  # all re-encodings pair up
    assert pairs[(1, 2)] == 0  # PNG is lossless: identical hash


def test_collapse_exact_keeps_mega_group_linear(spark):
    """The degenerate-block guard: 20 byte-identical images emit a
    19-edge star (linear), not 190 pairs (quadratic), and near-dup
    edges still reach the group through its representative."""
    import numpy as np

    from wc_vector_indexing_spark.operators.multimodal import image_near_pairs

    yy, xx = np.mgrid[0:8, 0:9]
    grid = (((yy + xx) % 2) * 255).astype(np.uint8)  # checkerboard
    img = np.kron(grid, np.ones((2, 2), dtype=np.uint8))
    base = b"P5\n18 16\n255\n" + img.tobytes()
    # a near-dup: swapping two cells in the BOTTOM row flips a known
    # handful of adjacent comparisons (0 < hamming <= 4) while leaving
    # the top-16-bit prefix block identical, so the pair stays joinable
    g2 = grid.copy()
    g2[7, 0], g2[7, 1] = 0, 255
    near = np.kron(g2, np.ones((2, 2), dtype=np.uint8))
    near_b = b"P5\n18 16\n255\n" + near.tobytes()
    rows = [(i, "image", bytearray(base)) for i in range(20)]
    rows.append((99, "image", bytearray(near_b)))
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")

    quadratic = image_near_pairs(media, max_hamming=4).collect()
    assert len(quadratic) == 190 + 20  # every identical pair + near edges

    linear = image_near_pairs(media, max_hamming=4, collapse_exact=True).collect()
    stars = [r for r in linear if r.hamming == 0]
    nears = [r for r in linear if r.hamming > 0]
    assert len(stars) == 19            # one star edge per non-representative
    assert all(r.media_a == 0 for r in stars)
    assert len(nears) == 1             # rep(0) <-> 99 only
    assert {(r.media_a, r.media_b) for r in nears} == {(0, 99)}


def test_four_band_join_finds_prefix_block_differences(spark):
    """The pigeonhole-complete form: a near-dup whose differing bits
    land in the TOP 16-bit block is invisible to the single-prefix join
    but guaranteed found with n_bands=4 (any Hamming<=3 pair shares at
    least one exact band)."""
    import numpy as np

    from wc_vector_indexing_spark.operators.multimodal import (
        hamming64_near_pairs,
        image_dhash,
    )

    yy, xx = np.mgrid[0:8, 0:9]
    grid = (((yy + xx) % 2) * 255).astype(np.uint8)
    g2 = grid.copy()
    g2[0, 0], g2[0, 1] = 255, 0  # edit in thumbnail row 0 -> top block
    rows = [
        (1, "image", bytearray(b"P5\n18 16\n255\n"
                               + np.kron(grid, np.ones((2, 2), np.uint8)).tobytes())),
        (2, "image", bytearray(b"P5\n18 16\n255\n"
                               + np.kron(g2, np.ones((2, 2), np.uint8)).tobytes())),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    fps = image_dhash(media)
    single = hamming64_near_pairs(fps, 4, "media_id", "dhash").collect()
    assert single == []  # prefix block differs -> candidate never forms
    banded = hamming64_near_pairs(fps, 4, "media_id", "dhash", n_bands=4).collect()
    assert [(r.media_a, r.media_b) for r in banded] == [(1, 2)]
    assert 0 < banded[0].hamming <= 4


def test_hamming_pairs_8_band_completeness(spark):
    """n_bands=8 must find a Hamming-4 pair whose four differing bits
    hit all four 16-bit bands (the 4-band blind spot); n_bands=4 misses
    it by construction — pinning both sides of the trade."""
    from wc_vector_indexing_spark.operators.multimodal import (
        hamming64_near_pairs,
    )

    base = 0x0123_4567_89AB_CDEF
    # flip one bit inside each 16-bit band (bits 0, 16, 32, 48)
    other = base ^ 0x0001_0001_0001_0001
    fps = spark.createDataFrame(
        [(1, base), (2, other)], "media_id long, h long")
    four = hamming64_near_pairs(fps, 4, "media_id", "h", n_bands=4).collect()
    eight = hamming64_near_pairs(fps, 4, "media_id", "h", n_bands=8).collect()
    assert four == []  # the documented 4-band blind spot
    assert [(r.media_a, r.media_b, r.hamming) for r in eight] == [(1, 2, 4)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide 64"):
        hamming64_near_pairs(fps, 4, "media_id", "h", n_bands=5).collect()
