"""Audio DSP operators — real spectral analysis over PCM WAV, pure
numpy (rfft), zero external codecs. Upgrades the audio half of the
multimodal path from "decode + opaque features" to the measurements an
audio-curation pipeline actually filters on, plus a perceptual
fingerprint for audio near-dup detection.

All quantities are textbook public DSP (spectral centroid/bandwidth/
rolloff, zero-crossing rate, RMS), and the fingerprint is the
band-energy-difference scheme of published audio-fingerprinting
systems (Haitsma & Kalker 2002 "A highly robust audio fingerprint
system"): per frame, compare adjacent log-spaced band energies; the
sign pattern is robust to volume change and mild noise, so re-encoded
/ re-leveled copies of one clip hash close in Hamming space.

Spark shape mirrors the image path exactly: decode + analyze in one
zero-shuffle Arrow pass (`audio_features`, `audio_fingerprint`), then
`audio_near_pairs` reuses the prefix-block + bit_count Hamming join of
`multimodal.image_near_pairs`."""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.multimodal import decode_audio

AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_s double, rms double, zcr double, "
    "spectral_centroid_hz double, spectral_bandwidth_hz double, "
    "spectral_rolloff_hz double, dominant_hz double"
)


def signal_features(samples: np.ndarray, rate: int) -> dict:
    """Clip-level DSP summary. ``samples``: (n_frames, n_channels) int;
    analysis runs on the channel mean, normalized to [-1, 1]."""
    x = samples.astype(np.float64).mean(axis=1)
    peak = float(np.abs(x).max()) or 1.0
    x = x / peak
    n = len(x)
    duration = n / float(rate)
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec**2
    total = float(power.sum())
    if total <= 0:
        return {
            "duration_s": duration, "rms": rms, "zcr": zcr,
            "spectral_centroid_hz": 0.0, "spectral_bandwidth_hz": 0.0,
            "spectral_rolloff_hz": 0.0, "dominant_hz": 0.0,
        }
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    cumulative = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cumulative, 0.85 * total))])
    dominant = float(freqs[int(power.argmax())])
    return {
        "duration_s": round(duration, 6), "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "spectral_centroid_hz": round(centroid, 3),
        "spectral_bandwidth_hz": round(bandwidth, 3),
        "spectral_rolloff_hz": round(rolloff, 3),
        "dominant_hz": round(dominant, 3),
    }


def audio_features(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(media_id, duration, rms, zcr, centroid, bandwidth, rolloff,
    dominant): one zero-shuffle Arrow pass — decode + rfft per clip
    where the bytes live, nothing but the summary row moves.
    ``on_error='skip'`` quarantines undecodable clips per record
    instead of failing the task (crawled audio is routinely corrupt)."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    samples, rate = decode_audio(bytes(content))
                except Exception:  # noqa: BLE001 — per-record isolation
                    if on_error == "raise":
                        raise
                    continue
                rows.append({"media_id": int(mid), **signal_features(samples, rate)})
            yield pd.DataFrame(
                rows,
                columns=[c.split(" ")[0] for c in AUDIO_FEATURES_SCHEMA.split(", ")],
            )

    return media.select(id_col, content_col).mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


N_BANDS = 17  # 16 adjacent-band comparisons per frame


def fingerprint64(samples: np.ndarray, rate: int, n_frames: int = 4) -> int:
    """64-bit clip fingerprint: split the clip into ``n_frames`` equal
    windows; per window, measure energy in ``N_BANDS`` log-spaced bands
    (300 Hz .. Nyquist) and emit one bit per adjacent-band comparison
    (energy[b] > energy[b+1]) — 4 windows x 16 comparisons = 64 bits.
    Volume scaling cancels in the comparisons (Haitsma-Kalker
    robustness property), so level-shifted re-encodes hash identically
    and unrelated audio differs in ~32 bits."""
    x = samples.astype(np.float64).mean(axis=1)
    peak = float(np.abs(x).max()) or 1.0
    x = x / peak
    n = len(x)
    if n < n_frames:
        return 0
    lo = 300.0
    hi = rate / 2.0
    edges = np.geomspace(lo, max(hi, lo * 2), N_BANDS + 1)
    bits = 0
    step = n // n_frames
    for f in range(n_frames):
        seg = x[f * step : (f + 1) * step]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
        energies = np.array(
            [spec[(freqs >= a) & (freqs < b)].sum() for a, b in zip(edges, edges[1:])]
        )
        # deadband: comparisons between two near-empty bands (or two
        # spectral-leakage tails) would be decided by quantization
        # noise — sign flips between re-encodes of the same clip.
        # Requiring the winner to lead by 0.1% of total energy makes
        # noise-level comparisons deterministically 0 while leaving
        # real band differences (percents of total) untouched.
        delta = 1e-3 * float(energies.sum())
        for b in range(N_BANDS - 1):
            bits = (bits << 1) | int(energies[b] > energies[b + 1] + delta)
    return bits


def audio_fingerprint(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(media_id, afp): 64-bit perceptual fingerprints, one Arrow pass.
    ``on_error='skip'`` quarantines undecodable clips per record (they
    just don't participate in dedup) instead of failing the task."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, fps = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    samples, rate = decode_audio(bytes(content))
                except Exception:  # noqa: BLE001 — per-record isolation
                    if on_error == "raise":
                        raise
                    continue
                ids.append(int(mid))
                # store as signed 64-bit (Spark long)
                fps.append(np.int64(np.uint64(fingerprint64(samples, rate))))
            yield pd.DataFrame({"media_id": ids, "afp": fps})

    return media.select(id_col, content_col).mapInPandas(
        run, schema="media_id long, afp long"
    )


def audio_near_pairs(
    media: DataFrame,
    max_hamming: int = 8,
    collapse_exact: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """Near-duplicate audio pairs: Hamming(afp_a, afp_b) ≤
    ``max_hamming`` over the shared prefix-blocked join
    (`multimodal.hamming64_near_pairs` — same shape as image/simhash;
    ``collapse_exact=True`` keeps a mega-group of identical clips —
    silence, jingles — linear instead of quadratic)."""
    from wc_vector_indexing_spark.operators.multimodal import hamming64_near_pairs

    return hamming64_near_pairs(
        audio_fingerprint(media), max_hamming, "media_id", "afp",
        collapse_exact, n_bands
    )


def audio_window_fingerprints(
    media: DataFrame,
    window_seconds: float = 0.5,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, window_no, afp): one 64-bit fingerprint per fixed
    window of the clip — the sub-clip granularity `audio_overlap_pairs`
    matches on (clip-level `audio_fingerprint` can only see whole-clip
    copies). One Arrow pass; 8 bytes per window leave the scan."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            ids, nos, fps = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_audio(bytes(content))
                step = max(1, int(window_seconds * rate))
                for wno, start in enumerate(range(0, len(samples) - step + 1, step)):
                    fp = fingerprint64(samples[start : start + step], rate)
                    ids.append(int(mid))
                    nos.append(wno)
                    fps.append(np.int64(np.uint64(fp)))
            yield pd.DataFrame({"media_id": ids, "window_no": nos, "afp": fps})

    return media.select(id_col, content_col).mapInPandas(
        run, schema="media_id long, window_no int, afp long"
    )


def audio_overlap_pairs(
    media: DataFrame,
    window_seconds: float = 0.5,
    min_overlap: float = 0.5,
    max_window_df: int = 1000,
) -> DataFrame:
    """Partial-copy audio detection: (media_a, media_b, shared_windows,
    overlap) where overlap = |shared distinct window fingerprints| /
    min(|A|, |B|) ≥ ``min_overlap`` — the clip-sampled-from-a-longer-
    recording case, same containment-join shape as
    `video.video_overlap_pairs` (posting-list candidates on the 8-byte
    window fingerprint, pair-keyed count agg, ``max_window_df`` caps
    silence/jingle boilerplate windows).

    Fixed windows match window-ALIGNED excerpts (cuts at window
    multiples — the concatenative/segment-reuse case). Arbitrary-offset
    excerpts need overlapping windows: emit fingerprints at stride
    window/2 by calling `audio_window_fingerprints` twice with a
    half-window-shifted signal — the published fingerprinting systems'
    standard trade of 2x index size for shift tolerance."""
    fw = audio_window_fingerprints(media, window_seconds).select(
        "media_id", "afp"
    ).distinct()
    keep = (
        fw.groupBy("afp").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_window_df)
        .select("afp")
    )
    fw = fw.join(keep, "afp")
    # sizes come from the SAME df-capped window population the shared
    # counts use — a clip dominated by boilerplate (capped) windows
    # would otherwise have an inflated denominator and could never
    # reach min_overlap even when fully contained in another clip
    sizes = fw.groupBy("media_id").agg(F.count("*").alias("n"))
    a = fw.select(F.col("media_id").alias("media_a"), "afp")
    b = fw.select(F.col("media_id").alias("media_b"), "afp")
    shared = (
        a.join(b, "afp")
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count("*").alias("shared_windows"))
    )
    sa = sizes.select(F.col("media_id").alias("media_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("media_id").alias("media_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(sa), "media_a")
        .join(F.broadcast(sb), "media_b")
        .withColumn(
            "overlap", F.round(F.col("shared_windows") / F.least("na", "nb"), 4)
        )
        .filter(F.col("overlap") >= min_overlap)
        .select("media_a", "media_b", "shared_windows", "overlap")
    )


def audio_overlap_pairs_near(
    media: DataFrame,
    window_seconds: float = 0.5,
    min_overlap: float = 0.5,
    max_window_hamming: int = 4,
    max_band_df: int = 1000,
    n_bands: int = 8,
) -> DataFrame:
    """Hamming-tolerant partial-copy detection: the cross-CODEC form of
    `audio_overlap_pairs`. Exact window-fingerprint equality breaks the
    moment one side is a lossy re-encode (an MP3 excerpt of a WAV
    recording lands 1-3 bits away per window — measured against
    operators/mp3_decode), so candidates come from an
    ``n_bands`` x (64/n_bands)-bit band equi-join over the window
    fingerprints — the default ``n_bands=8`` is pigeonhole-COMPLETE
    for window Hamming ≤ 7, covering the default
    ``max_window_hamming=4`` with margin (the old fixed 4x16 split was
    only complete to 3, a silent-recall trap at exactly distance 4) —
    verify is a JVM ``bit_count`` filter, and a shared A-window counts
    once no matter how many B-windows it matches (count-distinct on
    the A fingerprint). ``max_band_df`` caps boilerplate band posting
    lists (silence/jingle windows); the denominator counts only
    windows with at least one surviving band — the same
    capped-population rule the exact form uses. Shuffle volume:
    ``n_bands`` rows per window into one equi-join; no all-pairs
    anywhere."""
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    fw = audio_window_fingerprints(media, window_seconds).select(
        "media_id", "afp"
    ).distinct()
    bands = fw.select(
        "media_id", "afp",
        F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band_no"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftrightunsigned(afp, band_no * {width})").bitwiseAND(mask),
    )
    keep = (
        bands.groupBy("band_no", "band_val")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_band_df)
        .select("band_no", "band_val")
    )
    bands = bands.join(keep, ["band_no", "band_val"])
    sizes = bands.select("media_id", "afp").distinct().groupBy(
        "media_id").agg(F.count("*").alias("n"))
    a = bands.select(F.col("media_id").alias("media_a"),
                     F.col("afp").alias("afp_a"), "band_no", "band_val")
    b = bands.select(F.col("media_id").alias("media_b"),
                     F.col("afp").alias("afp_b"), "band_no", "band_val")
    cand = (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "afp_a", "afp_b")
        .distinct()
        .filter(
            F.bit_count(F.col("afp_a").bitwiseXOR(F.col("afp_b")))
            <= max_window_hamming
        )
    )
    shared = cand.groupBy("media_a", "media_b").agg(
        F.count_distinct("afp_a").alias("shared_windows"))
    sa = sizes.select(F.col("media_id").alias("media_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("media_id").alias("media_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(sa), "media_a")
        .join(F.broadcast(sb), "media_b")
        .withColumn(
            "overlap", F.round(F.col("shared_windows") / F.least("na", "nb"), 4)
        )
        .filter(F.col("overlap") >= min_overlap)
        .select("media_a", "media_b", "shared_windows", "overlap")
    )
