"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata (north-star extension surface).

Real at this layer: schemas, partition-aware batch iteration
(mapInPandas), UDF signatures, Arrow batch shapes, deterministic
fake feature extraction for tests. STUBBED (this container ships no
image/audio codecs): the actual decode — ``decode_image``/
``decode_audio`` raise NotImplementedError unless given the
deterministic fake codec, and the seam to plug Pillow/torchaudio/ffmpeg
is one function.

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


def decode_image(content: bytes):  # pragma: no cover - stub seam
    """Plug point for a real decoder (e.g. Pillow). Not available in
    this environment."""
    raise NotImplementedError(
        "image codecs not available in this environment; use FakeCodec "
        "or plug a real decoder here"
    )


def extract_features(
    media: DataFrame,
    dim: int = 64,
    codec: FakeCodec | None = None,
    content_col: str = "content",
    out_col: str = "features",
) -> DataFrame:
    """Batch feature extraction over Arrow batches (mapInPandas). The
    per-row work is codec.*_features; swapping FakeCodec for a real
    model keeps the Spark plan identical."""
    codec = codec or FakeCodec()
    out_schema = T.StructType(
        [f for f in media.schema.fields if f.name != content_col]
        + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                if row["kind"] == "audio":
                    v = codec.audio_features(content, dim)
                else:
                    v = codec.image_features(content, dim)
                feats.append(v.tolist())
            out = pdf.drop(columns=[content_col])
            out[out_col] = feats
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
