"""Pure-Python zstd decoder vs the independent libzstd writer
(pyarrow): round-trips across levels and corpus shapes (these pin the
predefined FSE distributions end-to-end — a wrong constant cannot
reproduce libzstd output byte-exactly), multi-frame and skippable
framing, and contract error paths."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest

from wc_vector_indexing_spark.operators.zstd_decode import (
    fse_build_table,
    fse_read_ncount,
    zstd_decompress,
)


def _zstd(payload: bytes, level: int = 3) -> bytes:
    return bytes(pa.Codec("zstd", compression_level=level).compress(payload))


def _lcg(n: int, seed: int = 42, mod: int = 256) -> bytes:
    out, x = bytearray(), seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x >> 16) % mod)
    return bytes(out)


def _wordsoup(n: int, seed: int = 7) -> bytes:
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon", b"zeta"]
    out, x = bytearray(), seed
    while len(out) < n:
        x = (x * 48271) % 2147483647
        out += words[x % len(words)] + b" "
    return bytes(out[:n])


CORPORA = [
    b"",
    b"a",
    b"hello world " * 200,              # single RLE-ish sequence
    bytes(range(256)) * 40,             # full byte alphabet
    _lcg(5000),                         # high entropy -> raw blocks
    _lcg(100000, mod=4),                # tiny alphabet -> heavy FSE
    _wordsoup(3000),
    _wordsoup(300000),                  # > 128 KB: multi-block + repeats
    b"x" * 400000,                      # long RLE
]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_against_libzstd(level):
    for payload in CORPORA:
        assert zstd_decompress(_zstd(payload, level)) == payload


def test_multiframe_and_skippable():
    a, b = b"first frame " * 50, b"second frame " * 50
    skip = struct.pack("<II", 0x184D2A53, 5) + b"metaz"
    assert zstd_decompress(_zstd(a) + skip + _zstd(b)) == a + b
    assert zstd_decompress(skip) == b""


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError):
        zstd_decompress(b"\x00\x01\x02\x03\x04\x05")
    good = _zstd(b"hello world " * 100)
    with pytest.raises(ValueError):
        zstd_decompress(good[:-3])  # drops part of the last block
    with pytest.raises(ValueError):
        zstd_decompress(good[:5])


def test_content_size_mismatch_detected():
    comp = bytearray(_zstd(b"hello world " * 100, 1))
    # frame content size is the 2 bytes after the FHD byte here
    assert comp[4] >> 6 == 1  # fcs_code 1 -> 2-byte size
    comp[5] ^= 0x01
    with pytest.raises(ValueError, match="content size"):
        zstd_decompress(bytes(comp))


def test_dictionary_frames_are_a_seam():
    # hand-build a frame header with a dictionary-id flag set
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x01, 0x00, 0x42])
    with pytest.raises(NotImplementedError):
        zstd_decompress(frame)


def test_fse_ncount_roundtrip_shape():
    # RLE-heavy corpus forces an FSE-compressed table somewhere; unit-
    # pin the ncount parser on a hand-built stream instead: accuracy 5,
    # one symbol with the full range
    # acc bits = 0 (5), then prob 32 for symbol 0: raw 6-bit value 63
    # (large-path: 63 - threshold 30 = 33 -> prob 32)
    stream = bytes([0xF0, 0x03])
    counts, acc, used = fse_read_ncount(stream, 10, 9)
    assert acc == 5 and counts == [32] and used == 2
    table = fse_build_table(counts, acc)
    assert len(table) == 32 and all(t[0] == 0 for t in table)


def test_fse_build_rejects_overflow():
    with pytest.raises(ValueError):
        fse_build_table([16, 17], 5)  # 33 slots into a 32-cell table


def test_xxh64_matches_jvm_xxhash64(spark):
    """Cross-validate the pure-Python xxh64 against the JVM's (Spark
    F.xxhash64, seed 42) — two implementations sharing nothing."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.zstd_decode import xxh64

    samples = [b"", b"a", b"hello world", bytes(range(256)), b"x" * 1000,
               b"the quick brown fox " * 37]
    df = spark.createDataFrame([(s,) for s in samples], ["b"])
    jvm = [r[0] for r in df.select(F.xxhash64("b")).collect()]
    for s, j in zip(samples, jvm):
        mine = xxh64(s, seed=42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == j


def test_content_checksum_verified():
    import struct

    from wc_vector_indexing_spark.operators.zstd_decode import xxh64

    payload = b"checksum me " * 50
    f = bytearray(_zstd(payload))
    assert not f[4] & 4
    f[4] |= 4  # set the Content_Checksum_Flag
    f += struct.pack("<I", xxh64(payload) & 0xFFFFFFFF)
    assert zstd_decompress(bytes(f)) == payload
    f[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch"):
        zstd_decompress(bytes(f))
    assert zstd_decompress(bytes(f), verify_checksum=False) == payload


# ------------------------------------------------- allocation bounds


def _rle_block(size: int, sym: int = 0x41, last: bool = False) -> bytes:
    hdr = (size << 3) | (1 << 1) | (1 if last else 0)
    return hdr.to_bytes(3, "little") + bytes([sym])


def _raw_frame(blocks: bytes, fhd: int = 0, wd: int = 0,
               fcs: bytes = b"") -> bytes:
    """Hand-crafted frame: FHD 0 = windowed/no-checksum/no-FCS; the
    window descriptor byte 0 declares a 1 KiB window."""
    f = struct.pack("<I", 0xFD2FB528) + bytes([fhd])
    if not fhd & 0x20:  # windowed frames carry the descriptor
        f += bytes([wd])
    return f + fcs + blocks


def test_rle_bomb_capped_by_max_output():
    # the ADVICE repro: a few hundred bytes of RLE blocks regenerating
    # megabytes — must hit the max_output guard, not the allocator
    blocks = b"".join(_rle_block(1024) for _ in range(50))
    blocks += _rle_block(1024, last=True)
    bomb = _raw_frame(blocks)
    assert len(bomb) < 256
    with pytest.raises(ValueError, match="max_output"):
        zstd_decompress(bomb, max_output=4096)
    # a trusting caller may lift the cap explicitly
    assert zstd_decompress(bomb, max_output=None) == b"A" * 1024 * 51


def test_block_size_over_window_rejected():
    # window descriptor 0 → 1 KiB window; a 2 KiB block violates
    # RFC 8878 Block_Size <= min(Window_Size, 128KB)
    with pytest.raises(ValueError, match="exceeds"):
        zstd_decompress(_raw_frame(_rle_block(2048, last=True)))
    # 128 KiB absolute cap even under a huge window (descriptor 0xF8
    # → exponent 31 would exceed the refusal band, use exponent 17 →
    # 128 MiB window)
    big_wd = 17 << 3
    with pytest.raises(ValueError, match="exceeds"):
        zstd_decompress(
            _raw_frame(_rle_block(200 * 1024, last=True), wd=big_wd))


def test_window_log_refusal_band():
    with pytest.raises(ValueError, match="window log"):
        zstd_decompress(_raw_frame(_rle_block(8, last=True), wd=0xF8))


def test_lying_fcs_fails_incrementally():
    # fcs_code=1 → 2-byte FCS (value+256); declare 256 bytes, emit
    # 2 KiB across two blocks under a 128 KiB window — the first
    # block already overruns the declaration
    fhd = 0x40
    wd = 7 << 3  # exponent 7 → 128 KiB window
    blocks = _rle_block(1024) + _rle_block(1024, last=True)
    f = _raw_frame(blocks, fhd=fhd, wd=wd, fcs=struct.pack("<H", 0))
    with pytest.raises(ValueError, match="overran its declared"):
        zstd_decompress(f)


def test_huffman_stream_exact_consumption():
    from wc_vector_indexing_spark.operators.zstd_decode import (
        _huffman_decode_stream,
        _huffman_table,
    )

    table, max_bits = _huffman_table([1, 1])
    # sentinel bit + 2 payload bits → exactly 2 one-bit symbols
    assert len(_huffman_decode_stream(bytes([0b111]), table, max_bits,
                                      2)) == 2
    with pytest.raises(ValueError, match="exactly consumed"):
        _huffman_decode_stream(bytes([0b111]), table, max_bits, 1)


# ------------------------------------------------- dictionary frames

import json
import shutil
import subprocess
import tempfile
from pathlib import Path

_ZSTD_CLI = shutil.which("zstd")


def _train_dict(tmp: Path, n_samples: int = 64, maxdict: int = 4096) -> Path:
    """Train a real dictionary with the zstd CLI (the independent
    writer, same discipline as the libzstd round-trips above)."""
    samples = []
    for i in range(n_samples):
        body = (
            f"shared header tokens across every sample file number {i} "
            f"with a common tail of boilerplate words {_wordsoup(160, i).decode('latin1')}"
        )
        p = tmp / f"s{i}.txt"
        p.write_bytes(body.encode("latin1"))
        samples.append(str(p))
    dpath = tmp / "dict.bin"
    subprocess.run(
        [_ZSTD_CLI, "--train", *samples, "-o", str(dpath),
         f"--maxdict={maxdict}"],
        check=True, capture_output=True)
    return dpath


def _cli_compress(payload: bytes, dict_path: Path | None,
                  tmp: Path, name: str) -> bytes:
    src = tmp / name
    src.write_bytes(payload)
    cmd = [_ZSTD_CLI, "-q", "-f", str(src), "-o", str(src) + ".zst"]
    if dict_path is not None:
        cmd[1:1] = ["-D", str(dict_path)]
    subprocess.run(cmd, check=True, capture_output=True)
    return (tmp / (name + ".zst")).read_bytes()


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_dictionary_roundtrip_against_cli():
    from wc_vector_indexing_spark.operators.zstd_decode import (
        ZDICT_MAGIC,
        parse_zstd_dictionary,
    )

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        dpath = _train_dict(tmp)
        dict_bytes = dpath.read_bytes()
        assert struct.unpack_from("<I", dict_bytes, 0)[0] == ZDICT_MAGIC
        zd = parse_zstd_dictionary(dict_bytes)
        assert zd.dict_id != 0 and len(zd.content) > 0
        payloads = [
            b"shared header tokens across every sample file number 7 "
            b"with a common tail of boilerplate words and some novel "
            b"content the dictionary has never seen before 12345",
            _wordsoup(5000, 99),
            b"x",  # tiny payload: dict still referenced
        ]
        for i, payload in enumerate(payloads):
            frame = _cli_compress(payload, dpath, tmp, f"p{i}.bin")
            assert zstd_decompress(frame, dictionary=dict_bytes) == payload
            # pre-parsed dictionary object takes the same path
            assert zstd_decompress(frame, dictionary=zd) == payload


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_dictionary_seam_and_mismatch():
    from wc_vector_indexing_spark.operators.zstd_decode import (
        parse_zstd_dictionary,
    )

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        dpath = _train_dict(tmp)
        payload = b"shared header tokens across every sample file"
        frame = _cli_compress(payload, dpath, tmp, "p.bin")
        # frame names a dictionary id, none supplied: the documented
        # external-resolution seam
        with pytest.raises(NotImplementedError, match="references"):
            zstd_decompress(frame)
        # wrong dictionary: flip the stored id
        wrong = bytearray(dpath.read_bytes())
        wrong[4] ^= 0xFF
        with pytest.raises(ValueError, match="wants dictionary"):
            zstd_decompress(frame, dictionary=bytes(wrong))
        # id-checked before use: parse still fine
        assert parse_zstd_dictionary(bytes(wrong)).dict_id != \
            parse_zstd_dictionary(dpath.read_bytes()).dict_id


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_raw_content_dictionary_roundtrip():
    # a non-magic dictionary file is pure prefix content (§5); the CLI
    # accepts it the same way, so the round trip pins our handling
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        raw = (b"raw content prefix dictionary with recurring phrases "
               b"the encoder may copy from ") * 20
        dpath = tmp / "raw.dict"
        dpath.write_bytes(raw)
        payload = (b"a payload that repeats: raw content prefix "
                   b"dictionary with recurring phrases the encoder may "
                   b"copy from and then diverges into its own text")
        frame = _cli_compress(payload, dpath, tmp, "p.bin")
        assert zstd_decompress(frame, dictionary=raw) == payload


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_zstd_lines_source_with_dictionary(spark):
    from wc_vector_indexing_spark.sources.zstd_text import read_zstd_lines

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        dpath = _train_dict(tmp)
        shard_dir = tmp / "shards"
        shard_dir.mkdir()
        want = {}
        for s in range(3):
            lines = [
                f"shared header tokens across every sample shard {s} line {i}"
                for i in range(10)
            ]
            payload = ("\n".join(lines) + "\n").encode()
            frame = _cli_compress(payload, dpath, tmp, f"shard{s}.bin")
            (shard_dir / f"shard{s}.zst").write_bytes(frame)
            want[f"shard{s}.zst"] = lines
        got = read_zstd_lines(
            spark, str(shard_dir / "*.zst"), dict_path=str(dpath)
        ).collect()
        by_shard = {}
        for r in got:
            by_shard.setdefault(r.path.rsplit("/", 1)[-1], []).append(
                (r.line_no, r.line))
        assert {k: [ln for _, ln in sorted(v)] for k, v in by_shard.items()} \
            == want
        # without the dictionary the shards must fail loudly, not
        # decode garbage
        with pytest.raises(Exception, match="dictionary"):
            read_zstd_lines(spark, str(shard_dir / "*.zst")).collect()


def _train_dict_variant(tmp: Path, tag: str, n_samples: int = 64,
                        maxdict: int = 4096) -> Path:
    """A second independent CLI-trained dictionary whose samples (and
    so ID + entropy tables) differ from _train_dict's."""
    samples = []
    for i in range(n_samples):
        body = (
            f"variant-{tag} corpus preamble row {i} :: "
            f"{_wordsoup(200, 1000 + i).decode('latin1')}"
        )
        p = tmp / f"v{tag}{i}.txt"
        p.write_bytes(body.encode("latin1"))
        samples.append(str(p))
    dpath = tmp / f"dict-{tag}.bin"
    subprocess.run(
        [_ZSTD_CLI, "--train", *samples, "-o", str(dpath),
         f"--maxdict={maxdict}"],
        check=True, capture_output=True)
    return dpath


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_dict_store_resolves_per_frame_ids():
    """External dictionary-ID resolution (the Common Crawl CDX .zst
    case): frames trained against DIFFERENT dictionaries decode in one
    call when a dict_store maps each frame's declared ID; an
    unresolvable ID keeps the explicit seam; a store entry whose bytes
    declare a different ID than its key is rejected."""
    from wc_vector_indexing_spark.operators.zstd_decode import (
        parse_zstd_dictionary,
    )

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        d1, d2 = _train_dict(tmp), _train_dict_variant(tmp, "b")
        b1, b2 = d1.read_bytes(), d2.read_bytes()
        id1 = parse_zstd_dictionary(b1).dict_id
        id2 = parse_zstd_dictionary(b2).dict_id
        assert id1 and id2 and id1 != id2
        p1 = b"shared header tokens plus novel text for dict one 111"
        p2 = b"variant-b corpus preamble plus novel text for dict two"
        f1 = _cli_compress(p1, d1, tmp, "a.bin")
        f2 = _cli_compress(p2, d2, tmp, "b.bin")
        store = {id1: b1, id2: b2}
        assert zstd_decompress(f1, dict_store=store) == p1
        assert zstd_decompress(f2, dict_store=store) == p2
        # CONCATENATED frames from different dictionaries: per-frame
        # resolution inside one input
        assert zstd_decompress(f1 + f2, dict_store=store) == p1 + p2
        # unresolvable ID: the seam stays explicit
        with pytest.raises(NotImplementedError, match="resolves"):
            zstd_decompress(f1, dict_store={id2: b2})
        # a store entry whose bytes declare a different ID is corrupt
        with pytest.raises(ValueError, match="dict_store entry"):
            zstd_decompress(f1, dict_store={id1: b2})


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_zstd_lines_source_with_dict_store_directory(spark):
    """Source-level resolution: a DIRECTORY of trained dictionaries is
    scanned once on the driver and keyed by declared ID; shards
    compressed against different dictionary generations read in one
    scan, and the explicit {id: path} map form agrees."""
    from wc_vector_indexing_spark.operators.zstd_decode import (
        parse_zstd_dictionary,
    )
    from wc_vector_indexing_spark.sources.zstd_text import read_zstd_lines

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        d1, d2 = _train_dict(tmp), _train_dict_variant(tmp, "s")
        store_dir = tmp / "dicts"
        store_dir.mkdir()
        (store_dir / "gen1.dict").write_bytes(d1.read_bytes())
        (store_dir / "gen2.dict").write_bytes(d2.read_bytes())
        (store_dir / "README.txt").write_bytes(b"not a dictionary")
        shard_dir = tmp / "shards"
        shard_dir.mkdir()
        want = {}
        for s, dpath in enumerate((d1, d2, d1)):
            lines = [f"generation shard {s} line {i}" for i in range(6)]
            payload = ("\n".join(lines) + "\n").encode()
            frame = _cli_compress(payload, dpath, tmp, f"g{s}.bin")
            (shard_dir / f"g{s}.zst").write_bytes(frame)
            want[f"g{s}.zst"] = lines
        got = read_zstd_lines(
            spark, str(shard_dir / "*.zst"), dict_store=str(store_dir)
        ).collect()
        by_shard = {}
        for r in got:
            by_shard.setdefault(r.path.rsplit("/", 1)[-1], []).append(
                (r.line_no, r.line))
        assert {k: [ln for _, ln in sorted(v)]
                for k, v in by_shard.items()} == want
        # explicit {id: path} map form resolves identically
        id1 = parse_zstd_dictionary(d1.read_bytes()).dict_id
        id2 = parse_zstd_dictionary(d2.read_bytes()).dict_id
        got2 = read_zstd_lines(
            spark, str(shard_dir / "*.zst"),
            dict_store={id1: str(d1), id2: str(d2)},
        ).count()
        assert got2 == 18
        # a store that can't resolve shard g1's ID quarantines exactly
        # that shard under on_error='skip'
        part = read_zstd_lines(
            spark, str(shard_dir / "*.zst"),
            dict_store={id1: str(d1)}, on_error="skip",
        ).collect()
        assert {r.path.rsplit("/", 1)[-1] for r in part} == \
            {"g0.zst", "g2.zst"}


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not available")
def test_cli_zst_with_dict_store(spark, tmp_path, capsys):
    """The zst CLI resolves dictionary-compressed shards through
    --dict-store (directory form)."""
    from wc_vector_indexing_spark.cli import main

    d1 = _train_dict(tmp_path)
    store_dir = tmp_path / "dicts"
    store_dir.mkdir()
    (store_dir / "gen1.dict").write_bytes(d1.read_bytes())
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    payload = ('\n'.join(
        '{"id": %d, "text": "shared header tokens row %d"}' % (i, i)
        for i in range(5)) + "\n").encode()
    (shard_dir / "a.zst").write_bytes(
        _cli_compress(payload, d1, tmp_path, "a.bin"))
    rc = main([
        "zst", "--src", str(shard_dir / "*.zst"),
        "--out", str(tmp_path / "out"),
        "--field", "id:long", "--field", "text:string",
        "--dict-store", str(store_dir),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_written"] == 5 and out["shards_read"] == 1
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.filter("id = 3").collect()[0].text == \
        "shared header tokens row 3"
