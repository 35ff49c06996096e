"""safetensors interchange: byte-level writer/parser inversion,
validation contract (offset tiling, dtype table, header cap), and the
distributed Spark round trip."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from wc_vector_indexing_spark.sources.safetensors import (
    parse_safetensors,
    read_safetensors_vectors,
    to_safetensors_bytes,
    write_safetensors_vectors,
)


def test_bytes_roundtrip_multi_dtype():
    tensors = {
        "ids": np.arange(10, dtype="<i8"),
        "vecs": np.linspace(-1, 1, 30, dtype="<f4").reshape(10, 3),
        "mask": np.array([True, False] * 5),
        "half": np.array([0.5, 1.5], dtype="<f2"),
    }
    blob = to_safetensors_bytes(tensors, metadata={"origin": "test"})
    got, meta = parse_safetensors(blob)
    assert meta == {"origin": "test"}
    for name, arr in tensors.items():
        assert got[name].dtype == arr.dtype
        assert np.array_equal(got[name], arr)


def test_header_is_aligned_and_parseable_json():
    blob = to_safetensors_bytes({"t": np.zeros(3, dtype="<f4")})
    (hlen,) = struct.unpack_from("<Q", blob, 0)
    assert (8 + hlen) % 8 == 0  # reference-impl alignment padding
    header = json.loads(blob[8:8 + hlen])
    assert header["t"]["dtype"] == "F32"
    assert header["t"]["shape"] == [3]


def test_validation_contract():
    blob = bytearray(to_safetensors_bytes({"t": np.zeros(4, dtype="<f4")}))
    with pytest.raises(ValueError, match="truncated"):
        parse_safetensors(b"\x01\x02")
    with pytest.raises(ValueError, match="100MB cap"):
        parse_safetensors(struct.pack("<Q", 1 << 40) + bytes(64))
    with pytest.raises(ValueError, match="overruns"):
        parse_safetensors(struct.pack("<Q", 10_000) + b"{}")
    # trailing bytes not covered by any tensor = corruption
    with pytest.raises(ValueError, match="trailing"):
        parse_safetensors(bytes(blob) + b"\x00\x00\x00\x00")
    # span/shape mismatch
    (hlen,) = struct.unpack_from("<Q", bytes(blob), 0)
    hdr = json.loads(bytes(blob)[8:8 + hlen])
    hdr["t"]["shape"] = [5]
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    bad = struct.pack("<Q", len(hj)) + hj + bytes(blob)[8 + hlen:]
    with pytest.raises(ValueError, match="byte span"):
        parse_safetensors(bad)
    # BF16 is a documented seam, not a reinterpretation
    hdr = json.loads(bytes(blob)[8:8 + hlen])
    hdr["t"]["dtype"] = "BF16"
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    with pytest.raises(NotImplementedError, match="BF16"):
        parse_safetensors(
            struct.pack("<Q", len(hj)) + hj + bytes(blob)[8 + hlen:])


def test_offset_gap_rejected():
    # hand-build a header whose single tensor starts at byte 4 of an
    # 8-byte buffer: bytes 0-3 are a gap
    hdr = {"t": {"dtype": "F32", "shape": [1], "data_offsets": [4, 8]}}
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    blob = struct.pack("<Q", len(hj)) + hj + bytes(8)
    with pytest.raises(ValueError, match="gap"):
        parse_safetensors(blob)


def test_spark_roundtrip(spark, tmp_path):
    from pyspark.sql import Row

    rows = [Row(vec_id=i, embedding=[float(i), float(i) / 2, -1.0])
            for i in range(50)]
    df = spark.createDataFrame(rows).repartition(4)
    manifest = write_safetensors_vectors(df, str(tmp_path / "shards"))
    shards = manifest.collect()
    assert sum(r.n_rows for r in shards) == 50
    assert all(r.shard.endswith(".safetensors") for r in shards)
    back = read_safetensors_vectors(
        spark, str(tmp_path / "shards" / "*.safetensors"))
    got = {r.vec_id: r.embedding for r in back.collect()}
    assert len(got) == 50
    assert got[7] == [7.0, 3.5, -1.0]


def test_spark_reader_skip_quarantines_whole_shard(spark, tmp_path):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0]) for i in range(8)]
    ).repartition(2)
    write_safetensors_vectors(df, str(tmp_path / "s"))
    (tmp_path / "s" / "zzz-corrupt.safetensors").write_bytes(b"\x00" * 16)
    with pytest.raises(Exception, match="corrupt safetensors"):
        read_safetensors_vectors(
            spark, str(tmp_path / "s" / "*.safetensors")).count()
    ok = read_safetensors_vectors(
        spark, str(tmp_path / "s" / "*.safetensors"), on_error="skip")
    assert ok.count() == 8


def test_ragged_vectors_are_contract_errors(spark, tmp_path):
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(vec_id=1, embedding=[1.0, 2.0]),
        Row(vec_id=2, embedding=[1.0, 2.0, 3.0]),
    ]).coalesce(1)
    with pytest.raises(Exception, match="ragged"):
        write_safetensors_vectors(df, str(tmp_path / "r"))
