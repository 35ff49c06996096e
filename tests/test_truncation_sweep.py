"""Systematic truncation robustness: every byte-walker in the package
must treat ANY prefix of a valid stream as either a successful partial
parse or contract-exception input (ValueError / NotImplementedError) —
never a bare IndexError / KeyError / struct.error / zlib.error leaking
out of internal arithmetic, and never an over-long loop. This is the
generalized form of the r10 review finding on ``_iter_records``
(truncated final record produced an end offset past EOF): crawl
corpora are FULL of cut-off files, and at 100 TB a non-contract
exception class is the difference between a quarantined row and a
failed Spark stage.

Each case parses every truncation length of a writer-generated
fixture (small fixtures, so the sweep is exhaustive, not sampled).
"""

from __future__ import annotations

import numpy as np
import pytest

OK_ERRORS = (ValueError, NotImplementedError)


def _sweep(parse, data: bytes, start: int = 0, stride: int = 1):
    """Run ``parse`` over every prefix; return the non-contract
    failures as (cut_length, exception) pairs."""
    bad = []
    for n in range(start, len(data), stride):
        try:
            parse(data[:n])
        except OK_ERRORS:
            pass
        except Exception as e:  # noqa: BLE001 — the point of the test
            bad.append((n, repr(e)))
    return bad


def test_truncated_jpeg():
    from wc_vector_indexing_spark.operators.jpeg import (
        decode_jpeg,
        encode_baseline,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    img = ((yy * 7 + xx * 11) % 256).astype(np.uint8)
    assert _sweep(decode_jpeg, encode_baseline(img)) == []


def test_truncated_png_gif_bmp_wav():
    from tests.test_audio import make_wav, sine
    from tests.test_png import encode_png
    from wc_vector_indexing_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    yy, xx = np.mgrid[0:12, 0:14]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    assert _sweep(decode_image, encode_png(img)) == []
    wav = make_wav(sine(300.0, 0.1), rate=8000)
    assert _sweep(decode_audio, wav, stride=7) == []


def test_truncated_mp3_mpeg1_and_lsf():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        decode_mp3,
        encode_mp3,
    )

    t = np.arange(1152 * 2)
    pcm = (0.5 * np.sin(2 * np.pi * 700 * t / 32000) * 32767).astype(np.int16)
    assert _sweep(decode_mp3, encode_mp3(pcm, 32000), stride=11) == []
    pcm2 = (0.5 * np.sin(2 * np.pi * 500 * np.arange(576 * 2) / 16000)
            * 32767).astype(np.int16)
    assert _sweep(decode_mp3, encode_mp3(pcm2, 16000, bitrate_kbps=48),
                  stride=7) == []


def test_truncated_media_header_walkers():
    from wc_vector_indexing_spark.operators.aac import (
        parse_adts_headers,
        to_adts_bytes,
    )
    from wc_vector_indexing_spark.operators.flac import (
        parse_flac_streaminfo,
        to_flac_bytes,
    )
    from wc_vector_indexing_spark.operators.mp4 import parse_mp4, to_mp4_bytes
    from wc_vector_indexing_spark.operators.ogg import parse_ogg, to_ogg_bytes
    from wc_vector_indexing_spark.operators.webp import (
        parse_webp,
        to_webp_bytes,
    )

    assert _sweep(parse_adts_headers, to_adts_bytes(5, 128)) == []
    assert _sweep(parse_flac_streaminfo,
                  to_flac_bytes(44100, 2, 16, 44100 * 3)) == []
    assert _sweep(parse_mp4, to_mp4_bytes(5000, 1000, 640, 360)) == []
    assert _sweep(parse_ogg, to_ogg_bytes("opus", 2, 48000, 960 * 50)) == []
    assert _sweep(parse_webp, to_webp_bytes("vp8", 320, 200)) == []


def test_truncated_wiki_dump_slices():
    from wc_vector_indexing_spark.sources.wikixml import (
        decode_slice,
        to_wiki_multistream,
    )

    pages = [{"title": f"D{i}", "ns": 0, "page_id": i + 1,
              "text": f"body {i}"} for i in range(6)]
    dump, _ = to_wiki_multistream(pages, pages_per_stream=2)
    assert _sweep(decode_slice, dump) == []


def test_truncated_zstd_decode():
    import pyarrow as pa

    from wc_vector_indexing_spark.operators.zstd_decode import (
        zstd_decompress,
    )

    comp = bytes(pa.Codec("zstd", compression_level=3)
                 .compress(b"the quick brown fox " * 100))
    assert _sweep(zstd_decompress, comp) == []


def test_truncated_aiff_au_walkers():
    from wc_vector_indexing_spark.operators.aiff_au import (
        parse_aiff,
        parse_au,
        to_aiff_bytes,
        to_au_bytes,
    )

    assert _sweep(parse_aiff, to_aiff_bytes(2, 44100, 16, 44100)) == []
    assert _sweep(parse_aiff,
                  to_aiff_bytes(1, 8000, 8, 8000, compression="ulaw")) == []
    assert _sweep(parse_au, to_au_bytes("pcm16", 16000, 2, 100)) == []


def test_truncated_tiff_exif_walkers():
    from wc_vector_indexing_spark.operators.tiff import (
        parse_exif,
        parse_tiff,
        to_jpeg_exif_bytes,
        to_tiff_bytes,
    )

    assert _sweep(parse_tiff,
                  to_tiff_bytes(640, 480, 16, 5, 2, 6, 3, "MM",
                                n_pages=3)) == []
    assert _sweep(parse_exif, to_jpeg_exif_bytes(orientation=6)) == []


def test_truncated_compressed_walkers():
    from wc_vector_indexing_spark.operators.compressed import (
        parse_gzip_member,
        parse_zstd_frame,
        to_gzip_bytes,
        to_zstd_frame_bytes,
    )

    assert _sweep(parse_gzip_member,
                  to_gzip_bytes(b"x" * 400, fname="a.txt")) == []
    assert _sweep(parse_zstd_frame, to_zstd_frame_bytes(b"y" * 600)) == []


def test_truncated_h264_annexb():
    from wc_vector_indexing_spark.operators.h264 import (
        parse_annexb,
        to_annexb_bytes,
    )

    assert _sweep(parse_annexb, to_annexb_bytes(80, 45, 2)) == []


def test_truncated_warc_wet_walkers():
    from wc_vector_indexing_spark.sources.warc import (
        _iter_records,
        _parse_record,
        to_warc_bytes,
    )
    from wc_vector_indexing_spark.sources import wet as wetmod

    recs = [{"url": "https://a.example/x", "html": "<p>abc</p>"},
            {"url": "https://a.example/y", "html": "<p>def</p>",
             "chunked": True}]
    data = to_warc_bytes(recs)

    def walk(b: bytes):
        n = len(b)
        for head, payload, start, end in _iter_records(b):
            assert 0 <= start <= end <= n, (start, end, n)
            _parse_record(head, payload)

    assert _sweep(walk, data) == []
    wet = wetmod.to_wet_bytes(
        [{"url": "https://a.example/x", "text": "hello"}])

    def walk_wet(b: bytes):
        # the same stitch + parse pass read_wet runs, minus Spark
        chunks = b.decode("latin-1").split("\r\n\r\nWARC/")
        for body, _ in wetmod._stitch((c, "p") for c in chunks):
            wetmod._parse_record(body)

    assert _sweep(walk_wet, wet) == []


def test_truncated_pdf_and_mbox():
    from wc_vector_indexing_spark.sources.mbox import parse_mbox, to_mbox
    from wc_vector_indexing_spark.sources.pdf import (
        extract_pdf_text,
        to_pdf_bytes,
    )

    pdf = to_pdf_bytes(["hello pdf world", "second page"])
    assert _sweep(extract_pdf_text, pdf, stride=3) == []
    mb = to_mbox([
        {"subject": "s1", "sender": "a@x.example",
         "date": "Mon, 01 Jan 2024 10:00:00 +0000", "body": "line one\n",
         "encoding": "7bit"},
        {"subject": "s2", "sender": "b@x.example",
         "date": "Tue, 02 Jan 2024 11:00:00 +0000", "body": "line two\n",
         "encoding": "base64"},
    ])
    assert _sweep(lambda b: parse_mbox(b.decode("latin-1")),
                  mb.encode()) == []


def test_truncated_avi():
    from tests.test_video import _avi, _frames
    from wc_vector_indexing_spark.operators.video import avi_frames
    from wc_vector_indexing_spark.operators.jpeg import decode_jpeg

    data = _avi(_frames(3))

    def walk(b: bytes):
        for f in avi_frames(b):
            decode_jpeg(f)

    assert _sweep(walk, data, stride=5) == []


def test_truncated_gif_bmp_netpbm():
    from tests.test_bmp_gif import encode_bmp, encode_gif
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:10, 0:12]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    rgb = np.stack([img, img[::-1], img], axis=2)
    assert _sweep(decode_image, encode_bmp(rgb)) == []
    palette = np.stack([np.arange(16) * 16] * 3, axis=1).astype(np.uint8)
    assert _sweep(decode_image, encode_gif(img % 16, palette)) == []
    pgm = b"P5\n12 10\n255\n" + img.tobytes()
    assert _sweep(decode_image, pgm) == []


def test_truncated_office_zip_walkers():
    from wc_vector_indexing_spark.sources.office import (
        extract_docx_text,
        extract_epub_chapters,
        to_docx_bytes,
        to_epub_bytes,
    )

    assert _sweep(extract_docx_text,
                  to_docx_bytes(["first para", "second para"])) == []
    assert _sweep(extract_epub_chapters,
                  to_epub_bytes(["chapter one text", "chapter two"])) == []


def test_truncated_parquet_footer():
    import io

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wc_vector_indexing_spark.operators.parquet_meta import (
        parse_parquet_footer,
    )

    buf = io.BytesIO()
    pq.write_table(pa.table({"a": list(range(50)), "b": ["x"] * 50}), buf)
    assert _sweep(parse_parquet_footer, buf.getvalue(), stride=3) == []
    from wc_vector_indexing_spark.operators.parquet_meta import (
        parquet_column_stats,
    )

    assert _sweep(parquet_column_stats, buf.getvalue(), stride=3) == []


def test_truncated_tfrecord():
    from wc_vector_indexing_spark.sources.tfrecord import (
        decode_example,
        iter_tfrecord,
        to_tfrecord_bytes,
    )

    recs = [
        {"doc_id": ("int64", [i]), "text": ("bytes", [f"body-{i}" * 3])}
        for i in range(4)
    ]
    data = to_tfrecord_bytes(recs)

    def parse(b: bytes):
        return [decode_example(p) for p in iter_tfrecord(b)]

    assert _sweep(parse, data) == []


def test_truncated_avro():
    from tests.test_avro import SCHEMA, _rows
    from wc_vector_indexing_spark.sources.avro import (
        parse_avro_file,
        to_avro_bytes,
    )

    for codec in ("null", "deflate"):
        data = to_avro_bytes(SCHEMA, _rows(5), codec=codec,
                             max_block_records=2)
        assert _sweep(parse_avro_file, data) == [], codec


def test_truncated_arrow_ipc():
    from tests.test_arrow_ipc import TYPES, _cols
    from wc_vector_indexing_spark.sources.arrow_ipc import (
        parse_arrow_file,
        to_arrow_ipc_bytes,
    )

    for fmt in ("file", "stream"):
        for comp in (None, "zstd"):
            data = to_arrow_ipc_bytes(_cols(5), TYPES, fmt=fmt,
                                      compression=comp,
                                      max_rows_per_batch=2)
            bad = _sweep(lambda b: parse_arrow_file(b, TYPES), data)
            assert bad == [], (fmt, comp)


def test_truncated_safetensors():
    from wc_vector_indexing_spark.sources.safetensors import (
        parse_safetensors,
        to_safetensors_bytes,
    )

    blob = to_safetensors_bytes({
        "ids": np.arange(12, dtype="<i8"),
        "vectors": np.linspace(0, 1, 48, dtype="<f4").reshape(12, 4),
    }, metadata={"k": "v"})
    assert _sweep(parse_safetensors, blob) == []
