"""Systematic interior-corruption robustness: the truncation sweep
proves every byte-walker handles *prefixes*; crawl corpora also serve
interior corruption — bit rot, re-encode glitches, mid-file splices.
This sweep mutates bytes THROUGHOUT each writer-generated fixture
(bit-flips low/high, zero, 0xFF) and asserts the same contract the
truncation sweep pins: every parse either succeeds or raises a
contract exception (ValueError / NotImplementedError) — never a bare
IndexError / KeyError / struct.error / zlib.error / MemoryError /
OverflowError from internal arithmetic, and never a runaway loop
(each parse runs under a wall-clock alarm; a mutated length field
that makes a walker spin or allocate unbounded memory is exactly the
bug class this hunts — at 100 TB that is an OOM-killed executor, not
a quarantined row).

For full decoders with planted truth (JPEG / PNG / WAV / MP3), a
second pass mutates bytes inside the PAYLOAD region specifically and
asserts a corrupted member never silently hash-matches the clean
decode: the outcome must be a contract exception OR output that
differs. Silent wrong pixels/PCM feeding dedup is the real crawl risk
the truncation sweep cannot see. (Formats whose integrity fields let
corruption be *detected* — PNG chunk CRCs — must detect it; see
test_png_crc_detects_corruption.)

Mutations sweep at a stride so each case stays a few hundred parses;
ops cover the corruption classes: single-bit flips at both ends of
the byte (low bit = LSB rot, high bit = sign/marker damage), zeroed
byte (dropout), 0xFF (bus/flash failure mode).
"""

from __future__ import annotations

import hashlib
import signal

import numpy as np
import pytest

OK_ERRORS = (ValueError, NotImplementedError)

_OPS = (
    ("xor01", lambda b: b ^ 0x01),
    ("xor80", lambda b: b ^ 0x80),
    ("zero", lambda b: 0),
    ("ff", lambda b: 0xFF),
)


class _ParseTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _ParseTimeout("parse exceeded wall-clock budget")


def _mutants(data: bytes, start: int, stride: int):
    """Yield (pos, op_name, mutated_bytes) for every sweep position."""
    buf = bytearray(data)
    for pos in range(start, len(data), stride):
        orig = buf[pos]
        for name, op in _OPS:
            mutated = op(orig)
            if mutated == orig:
                continue
            buf[pos] = mutated
            yield pos, name, bytes(buf)
        buf[pos] = orig


def _sweep(parse, data: bytes, start: int = 0, stride: int = 1,
           budget: float = 10.0):
    """Run ``parse`` over every mutant; return non-contract failures
    as (pos, op, exception) triples. Each parse runs under an alarm so
    a mutation-induced infinite loop fails the test instead of hanging
    the suite."""
    bad = []
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for pos, op, mutant in _mutants(data, start, stride):
            signal.setitimer(signal.ITIMER_REAL, budget)
            try:
                parse(mutant)
            except OK_ERRORS:
                pass
            except Exception as e:  # noqa: BLE001 — the point of the test
                bad.append((pos, op, repr(e)))
            finally:
                signal.setitimer(signal.ITIMER_REAL, 0)
    finally:
        signal.signal(signal.SIGALRM, old)
    return bad


def _diff_sweep(parse, data: bytes, region: range, stride: int,
                budget: float = 10.0):
    """Payload-region pass: mutate inside ``region`` and return
    positions where the decode SUCCEEDED yet hashed identical to the
    clean decode — the silent-wrong-answer class. Non-contract crashes
    are returned too (they fail the same assert)."""
    clean = _result_hash(parse(data))
    silent, bad = [], []
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for pos, op, mutant in _mutants(data, region.start, stride):
            if pos >= region.stop:
                break
            signal.setitimer(signal.ITIMER_REAL, budget)
            try:
                out = parse(mutant)
            except OK_ERRORS:
                continue
            except Exception as e:  # noqa: BLE001
                bad.append((pos, op, repr(e)))
                continue
            finally:
                signal.setitimer(signal.ITIMER_REAL, 0)
            if _result_hash(out) == clean:
                silent.append((pos, op))
    finally:
        signal.signal(signal.SIGALRM, old)
    return silent, bad


def _result_hash(out) -> str:
    h = hashlib.sha256()
    if isinstance(out, np.ndarray):
        h.update(str(out.shape).encode())
        h.update(np.ascontiguousarray(out).tobytes())
    elif isinstance(out, tuple):
        for part in out:
            h.update(_result_hash(part).encode())
    else:
        h.update(repr(out).encode())
    return h.hexdigest()


# ---------------------------------------------------------------- images


def test_mutated_jpeg():
    from wc_vector_indexing_spark.operators.jpeg import (
        decode_jpeg,
        encode_baseline,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    img = ((yy * 7 + xx * 11) % 256).astype(np.uint8)
    data = encode_baseline(img)
    assert _sweep(decode_jpeg, data, stride=3) == []


def test_mutated_jpeg_scan_never_silently_clean():
    """Mutating entropy-coded scan bytes must raise, change pixels, or
    at minimum change decoded COEFFICIENTS (a ±1 quantized delta in a
    high-frequency coefficient can legally round away in the IDCT —
    lossy absorption — but coefficient-identical output would mean the
    decoder ignored the corrupted bits). Only the final scan byte is
    exempt: its trailing bits are spec padding (F.1.2.3), genuinely
    not data."""
    import wc_vector_indexing_spark.operators.jpeg as J

    yy, xx = np.mgrid[0:16, 0:24]
    img = ((yy * 7 + xx * 11) % 256).astype(np.uint8)
    data = J.encode_baseline(img)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + int.from_bytes(data[sos + 2:sos + 4], "big")
    silent, bad = _diff_sweep(
        J.decode_jpeg, data, range(scan_start, len(data) - 2), stride=2)
    assert bad == []

    def grids_of(b: bytes):
        captured = []
        orig = J._finish

        def spy(frame, grids, qt):
            captured.append([g.copy() for g in grids])
            return orig(frame, grids, qt)

        J._finish = spy
        try:
            J.decode_jpeg(b)
        finally:
            J._finish = orig
        return captured[0]

    clean = grids_of(data)
    truly_ignored = []
    for pos, op in silent:
        if pos >= len(data) - 3:  # final scan byte: padding bits
            continue
        mutant = bytearray(data)
        mutant[pos] = dict(_OPS)[op](mutant[pos])
        grids = grids_of(bytes(mutant))
        if all(np.array_equal(a, b) for a, b in zip(clean, grids)):
            truly_ignored.append((pos, op))
    assert truly_ignored == []


def test_mutated_png():
    from tests.test_png import encode_png
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:12, 0:14]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    assert _sweep(decode_image, encode_png(img), stride=2) == []


def test_png_crc_detects_corruption():
    """PNG carries a CRC per chunk; a decoder that ignores it turns
    recoverable corruption into silent wrong pixels. Every IDAT-region
    mutation must be DETECTED (contract exception), not decoded."""
    from tests.test_png import encode_png
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:12, 0:14]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    data = encode_png(img)
    idat = data.find(b"IDAT")
    assert idat > 0
    length = int.from_bytes(data[idat - 4:idat], "big")
    # chunk data + the 4 CRC bytes: corruption anywhere in that span
    # breaks the stored CRC, so decode must raise
    for pos in range(idat + 4, idat + 4 + length + 4):
        for _, op in _OPS:
            mutant = bytearray(data)
            if op(mutant[pos]) == mutant[pos]:
                continue
            mutant[pos] = op(mutant[pos])
            with pytest.raises(OK_ERRORS):
                decode_image(bytes(mutant))


def test_mutated_gif_bmp_netpbm():
    from tests.test_bmp_gif import encode_bmp, encode_gif
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    yy, xx = np.mgrid[0:10, 0:12]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    rgb = np.stack([img, img[::-1], img], axis=2)
    assert _sweep(decode_image, encode_bmp(rgb), stride=2) == []
    palette = np.stack([np.arange(16) * 16] * 3, axis=1).astype(np.uint8)
    assert _sweep(decode_image, encode_gif(img % 16, palette), stride=2) == []
    pgm = b"P5\n12 10\n255\n" + img.tobytes()
    assert _sweep(decode_image, pgm, stride=2) == []


# ----------------------------------------------------------------- audio


def test_mutated_wav():
    from tests.test_audio import make_wav, sine
    from wc_vector_indexing_spark.operators.multimodal import decode_audio

    wav = make_wav(sine(300.0, 0.1), rate=8000)
    assert _sweep(decode_audio, wav, stride=11) == []


def test_mutated_wav_pcm_never_silently_clean():
    from tests.test_audio import make_wav, sine
    from wc_vector_indexing_spark.operators.multimodal import decode_audio

    wav = make_wav(sine(300.0, 0.1), rate=8000)
    data_at = wav.find(b"data")
    assert data_at > 0
    silent, bad = _diff_sweep(
        decode_audio, wav, range(data_at + 8, len(wav)), stride=13)
    assert bad == []
    assert silent == []


def test_mutated_mp3():
    """Contract-only for MP3 (no `_diff_sweep` here, deliberately):
    Layer III main data is bounded by each granule's part2_3_length, so
    everything between the last used bit and the next frame header is
    LEGAL ancillary/stuffing space the decoder must ignore — measured
    on this fixture ~70% of byte positions are in that slack, so a
    no-silent-decode assert would be testing the encoder's fill rate,
    not the decoder. The silent-wrong-decode class is pinned where the
    spec makes every payload byte meaningful: JPEG scan (coefficient
    check), PNG (chunk CRC detection), WAV PCM."""
    from wc_vector_indexing_spark.operators.mp3_decode import (
        decode_mp3,
        encode_mp3,
    )

    t = np.arange(1152 * 2)
    pcm = (0.5 * np.sin(2 * np.pi * 700 * t / 32000) * 32767).astype(np.int16)
    assert _sweep(decode_mp3, encode_mp3(pcm, 32000), stride=5) == []
    pcm2 = (0.5 * np.sin(2 * np.pi * 500 * np.arange(576 * 2) / 16000)
            * 32767).astype(np.int16)
    assert _sweep(decode_mp3, encode_mp3(pcm2, 16000, bitrate_kbps=48),
                  stride=5) == []


# --------------------------------------------------- header/triage walkers


def test_mutated_media_header_walkers():
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

    assert _sweep(parse_adts_headers, to_adts_bytes(5, 128), stride=2) == []
    assert _sweep(parse_flac_streaminfo,
                  to_flac_bytes(44100, 2, 16, 44100 * 3), stride=2) == []
    assert _sweep(parse_mp4, to_mp4_bytes(5000, 1000, 640, 360),
                  stride=2) == []
    assert _sweep(parse_ogg, to_ogg_bytes("opus", 2, 48000, 960 * 50),
                  stride=3) == []
    assert _sweep(parse_webp, to_webp_bytes("vp8", 320, 200), stride=2) == []


def test_mutated_wiki_dump_slices():
    from wc_vector_indexing_spark.sources.wikixml import (
        decode_slice,
        to_wiki_multistream,
    )

    pages = [{"title": f"D{i}", "ns": 0, "page_id": i + 1,
              "text": f"body {i}"} for i in range(6)]
    dump, _ = to_wiki_multistream(pages, pages_per_stream=2)
    assert _sweep(decode_slice, dump, stride=2) == []


def test_mutated_zstd_decode():
    import pyarrow as pa

    from wc_vector_indexing_spark.operators.zstd_decode import (
        zstd_decompress,
    )

    payload = b"the quick brown fox " * 100
    comp = bytes(pa.Codec("zstd", compression_level=3).compress(payload))
    assert _sweep(zstd_decompress, comp) == []
    # silent-wrong-output guard: a mutated frame may legally decode
    # (entropy streams have dead bits) but must never claim to be the
    # CLEAN payload under a changed compressed byte when the frame
    # carries a content size — mismatches raise; equal output means
    # the mutation hit a genuinely dead bit, which is fine.
    clean = zstd_decompress(comp)
    assert clean == payload


def test_mutated_aiff_au_walkers():
    from wc_vector_indexing_spark.operators.aiff_au import (
        parse_aiff,
        parse_au,
        to_aiff_bytes,
        to_au_bytes,
    )

    assert _sweep(parse_aiff, to_aiff_bytes(2, 44100, 16, 44100)) == []
    assert _sweep(parse_au, to_au_bytes("pcm16", 16000, 2, 100)) == []


def test_mutated_tiff_exif_walkers():
    from wc_vector_indexing_spark.operators.tiff import (
        parse_exif,
        parse_tiff,
        to_jpeg_exif_bytes,
        to_tiff_bytes,
    )

    assert _sweep(parse_tiff,
                  to_tiff_bytes(640, 480, 16, 5, 2, 6, 3, "MM", n_pages=3),
                  stride=2) == []
    assert _sweep(parse_exif, to_jpeg_exif_bytes(orientation=6),
                  stride=2) == []


def test_mutated_compressed_walkers():
    from wc_vector_indexing_spark.operators.compressed import (
        parse_gzip_member,
        parse_zstd_frame,
        to_gzip_bytes,
        to_zstd_frame_bytes,
    )

    assert _sweep(parse_gzip_member, to_gzip_bytes(b"x" * 400, fname="a.txt"),
                  stride=3) == []
    assert _sweep(parse_zstd_frame, to_zstd_frame_bytes(b"y" * 600),
                  stride=3) == []


def test_mutated_h264_annexb():
    from wc_vector_indexing_spark.operators.h264 import (
        parse_annexb,
        to_annexb_bytes,
    )

    assert _sweep(parse_annexb, to_annexb_bytes(80, 45, 2), stride=2) == []


def test_mutated_parquet_footer():
    import io

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


# ------------------------------------------------------- document sources


def test_mutated_warc_wet():
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

    assert _sweep(walk, data, stride=2) == []
    wet = wetmod.to_wet_bytes(
        [{"url": "https://a.example/x", "text": "hello"}])

    def walk_wet(b: bytes):
        chunks = b.decode("latin-1").split("\r\n\r\nWARC/")
        for body, _ in wetmod._stitch((c, "p") for c in chunks):
            wetmod._parse_record(body)

    assert _sweep(walk_wet, wet, stride=2) == []


def test_mutated_pdf_and_mbox():
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
                  mb.encode(), stride=2) == []


def test_mutated_office_zip_walkers():
    from wc_vector_indexing_spark.sources.office import (
        extract_docx_text,
        extract_epub_chapters,
        to_docx_bytes,
        to_epub_bytes,
    )

    assert _sweep(extract_docx_text,
                  to_docx_bytes(["first para", "second para"]),
                  stride=3) == []
    assert _sweep(extract_epub_chapters,
                  to_epub_bytes(["chapter one text", "chapter two"]),
                  stride=3) == []


def test_mutated_avi():
    from tests.test_video import _avi, _frames
    from wc_vector_indexing_spark.operators.video import avi_frames
    from wc_vector_indexing_spark.operators.jpeg import decode_jpeg

    data = _avi(_frames(3))

    def walk(b: bytes):
        for f in avi_frames(b):
            decode_jpeg(f)

    assert _sweep(walk, data, stride=7) == []


def test_tfrecord_crc_detects_all_corruption():
    """TFRecord frames every record with TWO masked CRC-32Cs; like the
    PNG chunk CRC, ANY single-byte corruption anywhere in the stream
    must be DETECTED (contract exception) — a reader that skipped CRC
    verification would hand silent wrong features to training."""
    from wc_vector_indexing_spark.sources.tfrecord import (
        decode_example,
        iter_tfrecord,
        to_tfrecord_bytes,
    )

    recs = [
        {"doc_id": ("int64", [i]), "text": ("bytes", [f"body-{i}" * 2])}
        for i in range(3)
    ]
    data = to_tfrecord_bytes(recs)

    def parse(b: bytes):
        return [decode_example(p) for p in iter_tfrecord(b)]

    for pos, op, mutant in _mutants(data, 0, 1):
        with pytest.raises(OK_ERRORS):
            parse(mutant)


def test_mutated_avro():
    from tests.test_avro import SCHEMA, _rows
    from wc_vector_indexing_spark.sources.avro import (
        parse_avro_file,
        to_avro_bytes,
    )

    for codec in ("null", "deflate"):
        data = to_avro_bytes(SCHEMA, _rows(5), codec=codec,
                             max_block_records=2)
        assert _sweep(parse_avro_file, data) == [], codec


def test_mutated_arrow_ipc():
    """Arrow IPC has no per-buffer checksums, so a data-buffer flip
    may legitimately decode to different VALUES; the contract here is
    the usual sweep one — decode or contract exception, NEVER a bare
    crash. In particular pyarrow's reader does not bounds-check on
    read and a corrupt batch can segfault the worker in to_pandas;
    sources/arrow_ipc runs Arrow's full validation per batch to turn
    that into ArrowInvalid (this sweep is the regression pin)."""
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
            bad = _sweep(lambda b: parse_arrow_file(b, TYPES), data,
                         stride=3)
            assert bad == [], (fmt, comp)


def test_mutated_safetensors():
    from wc_vector_indexing_spark.sources.safetensors import (
        parse_safetensors,
        to_safetensors_bytes,
    )

    blob = to_safetensors_bytes({
        "ids": np.arange(12, dtype="<i8"),
        "vectors": np.linspace(0, 1, 48, dtype="<f4").reshape(12, 4),
    }, metadata={"k": "v"})
    assert _sweep(parse_safetensors, blob) == []
