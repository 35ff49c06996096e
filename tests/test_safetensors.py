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
    # unknown dtypes still reject (BF16/FP8 decode — tests below)
    hdr = json.loads(bytes(blob)[8:8 + hlen])
    hdr["t"]["dtype"] = "F6_E3M2"
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    with pytest.raises(ValueError, match="unknown dtype"):
        parse_safetensors(
            struct.pack("<Q", len(hj)) + hj + bytes(blob)[8 + hlen:])


def test_bf16_decode_is_lossless_widening():
    """A hand-built BF16 tensor (bit patterns chosen by hand, no
    writer involved) decodes to EXACTLY bits<<16 as float32 — the
    public bfloat16 layout. Covers normals, subnormal, zero/-zero,
    ±inf, and NaN."""
    bits = np.array(
        [0x3F80,   # 1.0
         0xBF80,   # -1.0
         0x4049,   # ~3.140625 (pi truncated to bf16)
         0x0001,   # smallest subnormal
         0x0000, 0x8000,   # +0, -0
         0x7F80, 0xFF80,   # +inf, -inf
         0x7FC0],  # quiet NaN
        dtype="<u2")
    hdr = {"t": {"dtype": "BF16", "shape": [9],
                 "data_offsets": [0, 18]}}
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    blob = struct.pack("<Q", len(hj)) + hj + bits.tobytes()
    got, _ = parse_safetensors(blob)
    expect = (bits.astype("<u4") << np.uint32(16)).view("<f4")
    assert got["t"].dtype == np.dtype("<f4")
    assert np.array_equal(
        got["t"].view("<u4"), expect.view("<u4"))  # bit-exact, NaN incl.


def test_bf16_roundtrip_rne_and_exact_values():
    """Writer-side BF16: values exactly representable in bfloat16
    round-trip value-exactly; a value between two bf16 neighbours
    rounds to nearest (ties to even); NaN stays NaN."""
    from wc_vector_indexing_spark.sources.safetensors import (
        bf16_bits_to_f32,
        f32_to_bf16_bits,
    )

    exact = np.array([1.0, -2.5, 0.25, 96.0, 0.0, -0.0], dtype="<f4")
    blob = to_safetensors_bytes(
        {"v": exact}, dtype_overrides={"v": "BF16"})
    got, _ = parse_safetensors(blob)
    assert np.array_equal(got["v"], exact)
    assert np.array_equal(got["v"].view("<u4"), exact.view("<u4"))
    # 1.0 + 2^-8 sits exactly between bf16(1.0) and bf16(1.0078125):
    # RNE ties to the even mantissa -> 1.0; 1.0 + 3*2^-9 is past the
    # midpoint and rounds up
    tie = np.float32(1.0) + np.float32(2.0 ** -8)
    up = np.float32(1.0) + np.float32(3.0 * 2.0 ** -9)
    bits = f32_to_bf16_bits(np.array([tie, up], dtype="<f4"))
    assert bits[0] == 0x3F80          # 1.0 (tie to even)
    assert bits[1] == 0x3F81          # 1.0078125
    back = bf16_bits_to_f32(bits)
    assert back[0] == np.float32(1.0)
    assert back[1] == np.float32(1.0078125)
    # NaN survives encode (quiet bit forced, sign kept)
    nan_bits = f32_to_bf16_bits(np.array([np.nan, -np.nan], dtype="<f4"))
    assert np.isnan(bf16_bits_to_f32(nan_bits)).all()
    # inf must NOT be produced by rounding a finite value
    big = np.float32(3.3895314e38)  # max bf16 normal
    assert f32_to_bf16_bits(np.array([big], dtype="<f4"))[0] == 0x7F7F


def test_spark_bf16_shard_roundtrip(spark, tmp_path):
    """Distributed BF16 export: bf16-exact planted vectors survive the
    write→read cycle value-exactly; the shard really stores 2-byte
    elements (half the F32 payload)."""
    from pyspark.sql import Row

    rows = [Row(vec_id=i, embedding=[float(i), -0.5, 0.25])
            for i in range(16)]
    df = spark.createDataFrame(rows).repartition(2)
    write_safetensors_vectors(
        df, str(tmp_path / "bf"), vec_dtype="BF16")
    import glob as _glob

    shard = _glob.glob(str(tmp_path / "bf" / "*.safetensors"))[0]
    hdr_len = struct.unpack("<Q", open(shard, "rb").read(8))[0]
    hdr = json.loads(open(shard, "rb").read()[8:8 + hdr_len])
    assert hdr["vectors"]["dtype"] == "BF16"
    span = hdr["vectors"]["data_offsets"]
    assert span[1] - span[0] == hdr["vectors"]["shape"][0] * 3 * 2
    back = read_safetensors_vectors(
        spark, str(tmp_path / "bf" / "*.safetensors"))
    got = {r.vec_id: r.embedding for r in back.collect()}
    assert got[9] == [9.0, -0.5, 0.25]
    assert len(got) == 16


def test_fp8_decode_tables():
    """Hand-built FP8 tensors decode through the 256-entry LUTs with
    the OCP conventions: E4M3FN has no infinities (0x7E = 448 max
    normal, 0x7F = NaN), E5M2 is IEEE-style (0x7C = inf, 0x7D = NaN);
    subnormals and signed zero decode exactly."""

    def one(dtype, bits):
        hdr = {"t": {"dtype": dtype, "shape": [len(bits)],
                     "data_offsets": [0, len(bits)]}}
        hj = json.dumps(hdr, separators=(",", ":")).encode()
        blob = struct.pack("<Q", len(hj)) + hj + bytes(bits)
        got, _ = parse_safetensors(blob)
        assert got["t"].dtype == np.dtype("<f4")
        return got["t"]

    e4 = one("F8_E4M3", [0x38, 0x40, 0xC4, 0x7E, 0x01, 0x00, 0x80, 0x7F])
    assert e4[0] == 1.0 and e4[1] == 2.0 and e4[2] == -3.0
    assert e4[3] == 448.0                      # max normal, NOT inf
    assert e4[4] == 2.0 ** -9                  # smallest subnormal
    assert e4[5] == 0.0 and np.signbit(e4[6]) and e4[6] == 0.0
    assert np.isnan(e4[7])
    e5 = one("F8_E5M2", [0x3C, 0x42, 0x7B, 0x7C, 0xFC, 0x7D, 0x01])
    assert e5[0] == 1.0 and e5[1] == 3.0
    assert e5[2] == 57344.0                    # max normal
    assert np.isinf(e5[3]) and e5[3] > 0
    assert np.isinf(e5[4]) and e5[4] < 0
    assert np.isnan(e5[5])
    assert e5[6] == 2.0 ** -16                 # smallest subnormal


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


def test_index_reader_headers_only(spark, tmp_path):
    """read_safetensors_index inventories every tensor of every shard
    (name, dtype, shape-json, n_params, n_bytes) without decoding
    data; BF16/FP8 spans validate at their 2-/1-byte itemsizes; a
    corrupt shard quarantines whole under on_error='skip'."""
    from wc_vector_indexing_spark.sources.safetensors import (
        f32_to_bf16_bits,
        read_safetensors_index,
    )

    w = np.arange(12, dtype="<f4").reshape(3, 4)
    blob_a = to_safetensors_bytes(
        {"emb": w, "bias": np.zeros(3, dtype="<f4")},
        metadata={"origin": "test"})
    # hand-build a BF16+FP8 shard
    bf = f32_to_bf16_bits(w)
    hdr = {
        "w_bf16": {"dtype": "BF16", "shape": [3, 4],
                   "data_offsets": [0, 24]},
        "w_fp8": {"dtype": "F8_E4M3", "shape": [8],
                  "data_offsets": [24, 32]},
    }
    hj = json.dumps(hdr, separators=(",", ":")).encode()
    blob_b = (struct.pack("<Q", len(hj)) + hj
              + bf.tobytes() + bytes(range(8)))
    (tmp_path / "a.safetensors").write_bytes(blob_a)
    (tmp_path / "b.safetensors").write_bytes(blob_b)
    got = {
        (r.shard.rsplit("/", 1)[-1], r.tensor):
            (r.dtype, r.shape, r.n_params, r.n_bytes)
        for r in read_safetensors_index(
            spark, str(tmp_path / "*.safetensors")).collect()
    }
    assert got[("a.safetensors", "emb")] == ("F32", "[3,4]", 12, 48)
    assert got[("a.safetensors", "bias")] == ("F32", "[3]", 3, 12)
    assert got[("b.safetensors", "w_bf16")] == ("BF16", "[3,4]", 12, 24)
    assert got[("b.safetensors", "w_fp8")] == ("F8_E4M3", "[8]", 8, 8)
    # corrupt shard: truncated buffer -> whole-shard quarantine
    (tmp_path / "c.safetensors").write_bytes(blob_a[:-4])
    with pytest.raises(Exception, match="corrupt safetensors"):
        read_safetensors_index(
            spark, str(tmp_path / "*.safetensors")).count()
    ok = read_safetensors_index(
        spark, str(tmp_path / "*.safetensors"), on_error="skip")
    assert ok.count() == 4


def test_checkpoint_completeness(spark, tmp_path):
    """checkpoint_completeness verifies a sharded model directory
    against its HF-convention index: ok / missing (mapped shard or
    tensor absent) / misplaced (present in a different shard) /
    unindexed (present but unmapped) all surface."""
    from wc_vector_indexing_spark.sources.safetensors import (
        checkpoint_completeness,
    )

    s0 = to_safetensors_bytes({
        "layer0.w": np.zeros((2, 4), dtype="<f4"),
        "layer0.b": np.zeros(2, dtype="<f4"),
        "stray.t": np.zeros(3, dtype="<f4"),      # not in the index
    })
    s1 = to_safetensors_bytes({
        "layer1.w": np.zeros((2, 4), dtype="<f4"),
    })
    (tmp_path / "model-00000.safetensors").write_bytes(s0)
    (tmp_path / "model-00001.safetensors").write_bytes(s1)
    index = {
        "metadata": {"total_size": 0},
        "weight_map": {
            "layer0.w": "model-00000.safetensors",
            "layer0.b": "model-00000.safetensors",
            # index says shard 0, it actually lives in shard 1
            "layer1.w": "model-00000.safetensors",
            # mapped but nowhere on disk
            "layer2.w": "model-00002.safetensors",
        },
    }
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps(index))
    got = {r.tensor: r.status for r in
           checkpoint_completeness(spark, str(tmp_path)).collect()}
    assert got == {
        "layer0.w": "ok", "layer0.b": "ok",
        "layer1.w": "misplaced",
        "layer2.w": "missing",
        "stray.t": "unindexed",
    }
    # a malformed weight_map is a contract error
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": ["not", "a", "map"]}))
    with pytest.raises(ValueError, match="weight_map"):
        checkpoint_completeness(spark, str(tmp_path))


def test_checkpoint_drift_statuses_and_deltas(spark):
    from wc_vector_indexing_spark.sources.safetensors import (
        checkpoint_drift,
    )

    a = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.5, -0.5]), (3, [1.0, 1.0]),
         (4, [3.0, 4.0, 5.0])],
        "vec_id long, embedding array<float>")
    b = spark.createDataFrame(
        [(1, [1.0, 2.0]),            # unchanged
         (2, [0.5, 0.75]),           # changed: delta 1.25 in dim 1
         (4, [3.0, 4.0]),            # reshaped 3 -> 2
         (5, [9.0, 9.0])],           # added
        "vec_id long, embedding array<float>")
    got = {r["id"]: r.asDict()
           for r in checkpoint_drift(a, b).collect()}
    assert got[1]["status"] == "unchanged"
    assert got[1]["l2_delta"] == 0.0 and got[1]["max_abs_delta"] == 0.0
    assert got[2]["status"] == "changed"
    assert got[2]["l2_delta"] == 1.25 and got[2]["max_abs_delta"] == 1.25
    assert got[3]["status"] == "removed"
    assert got[3]["dim_a"] == 2 and got[3]["dim_b"] is None
    assert got[3]["l2_delta"] is None
    assert got[4]["status"] == "reshaped"
    assert got[4]["dim_a"] == 3 and got[4]["dim_b"] == 2
    assert got[4]["l2_delta"] is None
    assert got[5]["status"] == "added"
    assert got[5]["dim_a"] is None and got[5]["dim_b"] == 2
    # atol: a sub-threshold wiggle counts as unchanged
    b2 = spark.createDataFrame(
        [(1, [1.0, 2.0009765625])],  # fp-exact 2 + 2^-10 wiggle
        "vec_id long, embedding array<float>")
    a1 = a.filter("vec_id = 1")
    strict = checkpoint_drift(a1, b2).collect()[0]
    loose = checkpoint_drift(a1, b2, atol=0.01).collect()[0]
    assert strict["status"] == "changed"
    assert loose["status"] == "unchanged"
