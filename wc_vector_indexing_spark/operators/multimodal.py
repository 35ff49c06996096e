"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata (north-star extension surface).

Real at this layer: schemas, partition-aware batch iteration
(mapInPandas), UDF signatures, Arrow batch shapes, AND real decode for
every common format numpy + the standard library can express — netpbm
images (P2/P3 ASCII, P5/P6 binary), baseline + progressive +
sequential-arithmetic JPEG (operators/jpeg.py, jpeg_arith.py), PNG
incl. Adam7 (operators/png.py), PCM WAV audio via stdlib ``wave``
(DSP features in operators/audio.py), and MJPEG-AVI video
(operators/video.py). Formats still needing external codecs (MP3,
H.264, hierarchical/lossless JPEG) raise NotImplementedError at the
same one-function seam where Pillow/torchaudio/ffmpeg would
plug in;
``FakeCodec`` remains the deterministic stand-in for those in tests.

Scale notes baked into the design:
  * media bytes travel in their own column so column pruning keeps them
    out of every query that doesn't touch them;
  * feature extraction is mapInPandas over Arrow batches — one python
    worker round-trip per batch, not per row;
  * ``maxRecordsPerBatch`` bounds batch memory when rows are MB-sized
    (set spark.sql.execution.arrow.maxRecordsPerBatch accordingly);
  * frame sampling emits (media_id, frame_no) rows — an explode, so
    downstream embedding parallelizes per frame, not per video.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wc_vector_indexing_spark.operators.contract import quarantine

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


class FakeCodec:
    """Deterministic stand-in codec: 'decodes' bytes into a feature
    vector seeded by their sha256. Lets every Spark-side path (schema,
    batching, explode shapes) run for real without media libraries."""

    def image_features(self, content: bytes, dim: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(content or b"").digest()[:8], "big")
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.standard_normal(dim).astype(np.float32)

    def audio_features(self, content: bytes, dim: int) -> np.ndarray:
        return self.image_features(b"audio:" + (content or b""), dim)


def _netpbm_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer header tokens starting at
    ``start``, skipping ``#`` comments (netpbm spec)."""
    tokens: list[int] = []
    i = start
    while len(tokens) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(int(data[i:j]))
        i = j
    return tokens, i


@quarantine("image")
def decode_image(content: bytes) -> np.ndarray:
    """Decode an image to a numpy array — grayscale ``(h, w)`` for PGM,
    ``(h, w, 3)`` for PPM — using nothing but numpy.

    Supports the netpbm family: P5/P6 (binary PGM/PPM, 8- or 16-bit
    big-endian per spec), P2/P3 (ASCII), baseline, progressive,
    arithmetic AND lossless JPEG (SOF0/SOF2/SOF9/SOF10/SOF3 —
    pure-python T.81 decoders in operators/jpeg.py + jpeg_arith.py +
    jpeg_lossless.py), and PNG including Adam7 interlace
    (operators/png.py). Anything else (hierarchical JPEG, WebP, …)
    needs an external codec and raises NotImplementedError at this
    seam; plug Pillow here
    (``np.asarray(PIL.Image.open(io.BytesIO(content)))``) on a cluster
    that ships it."""
    magic = (content or b"")[:2]
    if magic == b"\xff\xd8":
        from wc_vector_indexing_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)
    if (content or b"")[:8] == b"\x89PNG\r\n\x1a\n":
        from wc_vector_indexing_spark.operators.png import decode_png

        return decode_png(content)
    if (content or b"")[:6] in (b"GIF87a", b"GIF89a"):
        from wc_vector_indexing_spark.operators.bmp_gif import decode_gif

        return decode_gif(content)
    if magic == b"BM":
        from wc_vector_indexing_spark.operators.bmp_gif import decode_bmp

        return decode_bmp(content)
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise NotImplementedError(
            "only netpbm (P2/P3/P5/P6), baseline JPEG, PNG, GIF, and BMP "
            "decode "
            "without external codecs in this environment; plug a real "
            "decoder (e.g. Pillow) at decode_image, or use FakeCodec "
            "for opaque bytes"
        )
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), i = _netpbm_tokens(content, 3, 2)
    if not (0 < maxval < 65536 and w > 0 and h > 0):
        raise ValueError(f"bad netpbm header: {w}x{h} maxval={maxval}")
    n_vals = w * h * channels
    if magic in (b"P5", b"P6"):
        i += 1  # exactly one whitespace byte separates header and raster
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        raster = np.frombuffer(content, dtype=dtype, count=n_vals, offset=i)
    else:
        vals, _ = _netpbm_tokens(content, n_vals, i)
        raster = np.array(vals, dtype=np.uint16 if maxval > 255 else np.uint8)
    img = raster.astype(np.uint16 if maxval > 255 else np.uint8)
    return img.reshape((h, w, 3)) if channels == 3 else img.reshape((h, w))


@quarantine("audio")
def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Decode audio to ``(samples, sample_rate)``; ``samples`` is
    ``(n_frames, n_channels)`` int16. PCM WAV decodes with stdlib
    ``wave`` (8-bit WAV is unsigned per spec and is re-centred to
    signed); MPEG-1 Layer III decodes through the pure-numpy pipeline
    in ``operators/mp3_decode.py`` (see its docstring for the two
    documented table seams). Remaining compressed formats (Ogg, AAC,
    MPEG Layers I/II, …) raise NotImplementedError at this seam — plug
    torchaudio/soundfile here on a cluster that ships them."""
    import io
    import wave

    head = (content or b"")[:3]
    if head == b"ID3" or (len(head) >= 2 and head[0] == 0xFF
                          and (head[1] & 0xE0) == 0xE0):
        from wc_vector_indexing_spark.operators.mp3_decode import decode_mp3

        return decode_mp3(content)
    try:
        with wave.open(io.BytesIO(content or b""), "rb") as wf:
            rate = wf.getframerate()
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            f"only PCM WAV and MPEG-1 Layer III decode without external "
            f"codecs ({exc}); plug a real decoder at decode_audio, or use "
            "FakeCodec for opaque bytes"
        ) from exc
    if width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4")
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    return samples.reshape(-1, n_ch), rate


def resize_image(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize to ``(out_h, out_w)`` via pure numpy
    index sampling — no interpolation libraries needed. Works for both
    grayscale ``(h, w)`` and colour ``(h, w, c)`` arrays."""
    out_h, out_w = size
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows][:, cols]


class StdlibCodec(FakeCodec):
    """Codec backed by the real stdlib/numpy decoders: netpbm pixels and
    WAV samples become actual content-derived features. Formats the
    environment can't decode raise (strict) — compose with FakeCodec
    explicitly if opaque bytes should still flow."""

    def image_features(self, content: bytes, dim: int) -> np.ndarray:
        img = decode_image(content)
        gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
        g = max(1, int(dim**0.5))
        thumb = resize_image(gray, (g, g)).astype(np.float64).ravel() / 255.0
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, thumb.size)] = thumb[: min(dim, thumb.size)]
        return out

    def audio_features(self, content: bytes, dim: int) -> np.ndarray:
        samples, _rate = decode_audio(content)
        mono = samples.mean(axis=1).astype(np.float64)
        if mono.size == 0:
            return np.zeros(dim, dtype=np.float32)
        # dim-bucket RMS energy envelope, scale-normalised
        buckets = np.array_split(mono, dim)
        rms = np.array([np.sqrt(np.mean(b**2)) if b.size else 0.0 for b in buckets])
        peak = np.abs(mono).max() or 1.0
        return (rms / peak).astype(np.float32)


def extract_features(
    media: DataFrame,
    dim: int = 64,
    codec: FakeCodec | None = None,
    content_col: str = "content",
    out_col: str = "features",
    on_error: str = "raise",
) -> DataFrame:
    """Batch feature extraction over Arrow batches (mapInPandas). The
    per-row work is codec.*_features; swapping FakeCodec for a real
    model keeps the Spark plan identical.

    ``on_error`` (crawled media is routinely corrupt — one bad file
    must not fail a whole task; same isolation contract as
    embed.embed_texts):
      'raise'  propagate the first decode error (default)
      'skip'   drop undecodable rows from the output
      'mark'   NULL features + ``decode_error`` column for bad rows
    """
    if on_error not in ("raise", "skip", "mark"):
        raise ValueError("on_error must be 'raise', 'skip', or 'mark'")
    codec = codec or FakeCodec()
    fields = [f for f in media.schema.fields if f.name != content_col] + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), True)
    ]
    if on_error == "mark":
        fields.append(T.StructField("decode_error", T.StringType(), True))
    out_schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[list[float] | None] = []
            errs: list[str | None] = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                try:
                    if row["kind"] == "audio":
                        v = codec.audio_features(content, dim)
                    else:
                        v = codec.image_features(content, dim)
                    feats.append(v.tolist())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    if on_error == "raise":
                        raise
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            out = pdf.drop(columns=[content_col])
            out[out_col] = feats
            if on_error == "mark":
                out["decode_error"] = errs
            elif on_error == "skip":
                out = out[[e is None for e in errs]]
            yield out

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for videos: (media_id, frame_no) rows via a pure
    column-level sequence + explode — the real decode of each sampled
    frame would hang off this exploded row set."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_no"))
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: per kind, counts + byte/duration
    stats. Column pruning keeps `content` unread here — verify with
    .explain (ReadSchema excludes the binary column)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.avg(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("avg_duration_ms"),
    )


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: grayscale → 9×8 nearest-neighbour thumb →
    bit i set iff pixel[r, c] > pixel[r, c+1] (row-major). The standard
    perceptual fingerprint — resize/re-encode/brightness-shift keep the
    horizontal-gradient signs, so near-identical images land within a
    few Hamming bits (public dHash construction, widely documented)."""
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    thumb = resize_image(gray, (8, 9)).astype(np.float64)
    bits = (thumb[:, :-1] > thumb[:, 1:]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into Spark's signed long
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(media_id, dhash): Arrow-batched perceptual fingerprints for the
    image rows. Zero shuffle — decode + hash are per-row; non-image rows
    are filtered before the Python stage so bytes never cross for them.
    ``on_error='skip'`` quarantines undecodable images (the row simply
    doesn't participate in dedup) instead of failing the task."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    imgs = media.filter(F.col("kind") == "image").select(id_col, content_col)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                try:
                    h = dhash64(decode_image(c))
                except Exception:  # noqa: BLE001 — per-record isolation
                    if on_error == "raise":
                        raise
                    continue
                ids.append(mid)
                hs.append(h)
            yield pd.DataFrame({id_col: ids, "dhash": hs})

    return imgs.mapInPandas(run, schema=f"{id_col} long, dhash long")


def hamming64_near_pairs(
    fps: DataFrame,
    max_hamming: int,
    id_col: str,
    hash_col: str,
    collapse_exact: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """Shared 64-bit-fingerprint near-pair join (images, audio, simhash
    shapes): Hamming ≤ ``max_hamming`` pairs.

    ``n_bands=1`` blocks on the top-16-bit prefix — cheap, but a pair
    whose differing bits land in that prefix is missed. ``n_bands>1``
    is the pigeonhole form: candidates come from matching ANY of the
    64/n-bit bands, so every pair within Hamming ``n_bands - 1`` shares
    at least one exact band and is guaranteed found — ``n_bands=4``
    (16-bit bands) is complete to 3, ``n_bands=8`` (8-bit bands) to 7
    (pairs past that bound are found unless their differing bits hit
    every band). Cost: n rows per fingerprint into the equi-join
    instead of 1, plus a distinct over candidate pairs; wider bands
    mean fewer, more selective candidates, so pick the smallest n that
    covers ``max_hamming``.

    ``collapse_exact=True`` is the degenerate-block guard: a fingerprint
    shared by k items (all-black thumbnails, silence clips) would emit
    k·(k-1)/2 pairs — quadratic in the hot block. Instead each exact
    group emits a k-1-edge star to its min-id representative and ONLY
    representatives enter the Hamming join, so output is linear in
    duplicate multiplicity and downstream connected components recover
    the identical clusters."""
    pa, pb = f"{id_col}_a".replace("media_id_a", "media_a"),         f"{id_col}_b".replace("media_id_b", "media_b")
    if collapse_exact:
        groups = fps.groupBy(hash_col).agg(
            F.min(id_col).alias("_rep"), F.count("*").alias("_n")
        )
        stars = (
            fps.join(groups, hash_col)
            .filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col("_rep").alias(pa),
                F.col(id_col).alias(pb),
                F.lit(0).alias("hamming"),
            )
        )
        reps = groups.select(F.col("_rep").alias(id_col), hash_col)
        return stars.unionByName(
            hamming64_near_pairs(reps, max_hamming, id_col, hash_col, False, n_bands)
        )
    if n_bands == 1:
        blocked = fps.withColumn(
            "block", F.shiftrightunsigned(F.col(hash_col), 48).cast("string")
        )
    else:
        if 64 % n_bands:
            raise ValueError("n_bands must divide 64")
        width = 64 // n_bands  # n_bands=4 -> complete <=3; 8 -> <=7
        bands = F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), width * i)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            )
            for i in range(n_bands)
        ])
        blocked = (
            fps.select(id_col, hash_col, F.explode(bands).alias("b"))
            .withColumn(
                "block", F.concat_ws(":", F.col("b.band"), F.col("b.key"))
            )
            .drop("b")
        )
    a = blocked.select(F.col(id_col).alias(pa), F.col(hash_col).alias("ha"), "block")
    b = blocked.select(F.col(id_col).alias(pb), F.col(hash_col).alias("hb"), "block")
    pairs = (
        a.join(b, ["block"])
        .filter(F.col(pa) < F.col(pb))
        .select(pa, pb, "ha", "hb")
    )
    if n_bands > 1:
        pairs = pairs.distinct()  # a pair may match in several bands
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(pa, pb, "hamming")
    )


def image_near_pairs(
    media: DataFrame,
    max_hamming: int = 10,
    content_col: str = "content",
    id_col: str = "media_id",
    collapse_exact: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """Near-duplicate image pairs: Hamming(dhash_a, dhash_b) ≤
    ``max_hamming`` over the banded join (see `hamming64_near_pairs`:
    ``n_bands=4`` for pigeonhole-complete recall, ``collapse_exact=True``
    to keep a mega-group of byte-identical thumbnails linear)."""
    fps = image_dhash(media, content_col, id_col)
    return hamming64_near_pairs(
        fps, max_hamming, id_col, "dhash", collapse_exact, n_bands
    )
