"""GGUF model-file source: header writer/parser inversion over the
public spec (ggml docs/gguf.md v3), the ggml block-quant size table,
Q8_0/Q4_0 reference quantization arithmetic, and the distributed
headers-only census + vector round trip."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wc_vector_indexing_spark.sources.gguf import (
    GGML_TYPES,
    decode_tensor,
    dequantize_q4_0,
    dequantize_q8_0,
    parse_gguf_header,
    quantize_q4_0,
    quantize_q8_0,
    read_gguf_index,
    read_gguf_metadata,
    read_gguf_vectors,
    to_gguf_bytes,
    write_gguf_vectors,
)


def _sample_blob() -> tuple[bytes, np.ndarray, np.ndarray]:
    rng = np.random.default_rng(11)
    a = rng.normal(size=(4, 64)).astype(np.float32)
    b = (rng.normal(size=(2, 32)) * 3).astype(np.float32)
    blob = to_gguf_bytes(
        {"general.architecture": "test", "ctx": 4096,
         "names": ["a", "b"], "rope": 1.5, "flag": True},
        [("t.f32", a, "F32"), ("t.q8", b, "Q8_0"),
         ("t.q4", b, "Q4_0"), ("t.bf16", a, "BF16")])
    return blob, a, b


def test_header_roundtrip_metadata_and_infos():
    blob, a, b = _sample_blob()
    meta, infos, base = parse_gguf_header(blob)
    assert meta["general.architecture"] == "test"
    assert meta["ctx"] == 4096
    assert meta["names"] == ["a", "b"]
    assert abs(meta["rope"] - 1.5) < 1e-9
    assert meta["flag"] is True
    by_name = {i["tensor"]: i for i in infos}
    # row-major shapes recovered (spec stores ne[] column-major)
    assert by_name["t.f32"]["shape"] == [4, 64]
    assert by_name["t.f32"]["n_bytes"] == 256 * 4
    # quant sizes from the block table, not from data
    assert by_name["t.q8"]["n_bytes"] == 64 // 32 * 34
    assert by_name["t.q4"]["n_bytes"] == 64 // 32 * 18
    assert by_name["t.bf16"]["n_bytes"] == 256 * 2
    # offsets aligned to general.alignment (default 32)
    for i in infos:
        assert i["offset"] % 32 == base % 32 == 0


def test_float_decode_exact_and_quant_error_bounds():
    blob, a, b = _sample_blob()
    _, infos, _ = parse_gguf_header(blob)
    by_name = {i["tensor"]: i for i in infos}

    def cut(i):
        return blob[i["offset"]:i["offset"] + i["n_bytes"]]

    assert np.array_equal(
        decode_tensor(cut(by_name["t.f32"]), "F32", 256), a.reshape(-1))
    dq8 = decode_tensor(cut(by_name["t.q8"]), "Q8_0", 64)
    # Q8_0 reconstruction error is bounded by half a quantization step
    assert np.abs(dq8 - b.reshape(-1)).max() <= np.abs(b).max() / 127 * 1.05
    dq4 = decode_tensor(cut(by_name["t.q4"]), "Q4_0", 64)
    assert np.abs(dq4 - b.reshape(-1)).max() <= np.abs(b).max() / 8 * 1.05
    bf = decode_tensor(cut(by_name["t.bf16"]), "BF16", 256)
    assert np.abs(bf - a.reshape(-1)).max() <= np.abs(a).max() / 128


def test_q8_0_golden_block():
    # hand-computed: block of 32, max|x| = 127 -> d = 1.0, q = x exactly
    x = np.arange(-127, 127, 8, dtype=np.float32)  # 32 values, max 127
    assert x.size == 32 and np.abs(x).max() == 127
    raw = quantize_q8_0(x)
    assert len(raw) == 34
    d = np.frombuffer(raw[:2], dtype=np.float16)[0]
    assert d == 1.0
    q = np.frombuffer(raw[2:], dtype=np.int8)
    assert np.array_equal(q, x.astype(np.int8))
    assert np.array_equal(dequantize_q8_0(raw, 32), x)


def test_q4_0_golden_block_nibble_layout():
    # d = max-magnitude/-8; with x[i] = -8 at argmax, d = 1.0 and the
    # quants recover x + 8 exactly for integer inputs in [-8, 7]
    x = np.array([-8, 7] * 16, dtype=np.float32)
    raw = quantize_q4_0(x)
    assert len(raw) == 18
    d = np.frombuffer(raw[:2], dtype=np.float16)[0]
    assert d == 1.0
    # element i sits in the low nibble of byte i (i<16), high of i-16
    nib = np.frombuffer(raw[2:], dtype=np.uint8)
    assert (nib[0] & 0x0F) == 0      # -8/1.0 + 8 = 0
    assert (nib[1] & 0x0F) == 15     # 7 + 8 = 15
    assert np.array_equal(dequantize_q4_0(raw, 32), x)


def test_zero_block_quantizes_to_zero():
    z = np.zeros(32, dtype=np.float32)
    assert np.array_equal(dequantize_q8_0(quantize_q8_0(z), 32), z)
    assert np.array_equal(dequantize_q4_0(quantize_q4_0(z), 32), z)


def test_validation_contract():
    blob, _, _ = _sample_blob()
    with pytest.raises(ValueError, match="magic"):
        parse_gguf_header(b"XGUF" + blob[4:])
    with pytest.raises(ValueError, match="version"):
        parse_gguf_header(blob[:4] + struct.pack("<I", 1) + blob[8:])
    for cut in (3, 10, 40, len(blob) - 1):
        with pytest.raises(ValueError):
            parse_gguf_header(blob[:cut])
    # unknown ggml tensor type id is refused, not guessed
    assert 5 not in GGML_TYPES  # removed Q4_3 slot stays unknown
    bad = to_gguf_bytes({}, [("t", np.zeros(4, dtype=np.float32), "F32")])
    pos = bad.find(struct.pack("<Q", 1) + b"t")  # uint64 len + name
    assert pos > 0
    # tensor type field sits after name(8+1) + n_dims(4) + ne(8)
    tpos = pos + 9 + 4 + 8
    mut = bad[:tpos] + struct.pack("<I", 5) + bad[tpos + 4:]
    with pytest.raises(ValueError, match="unknown ggml"):
        parse_gguf_header(mut)


def test_block_divisibility_enforced():
    # writer side: quantizer refuses non-multiple-of-32 blocks
    with pytest.raises(ValueError, match="divisible"):
        to_gguf_bytes(
            {}, [("t", np.zeros((2, 30), dtype=np.float32), "Q8_0")])
    # parser side: patch a valid Q8_0 shard's ne[0] to a non-multiple
    blob = to_gguf_bytes(
        {}, [("t", np.zeros(32, dtype=np.float32), "Q8_0")])
    pos = blob.find(struct.pack("<Q", 1) + b"t")
    ne_pos = pos + 9 + 4  # after name(8+1) + n_dims(4)
    assert struct.unpack_from("<Q", blob, ne_pos)[0] == 32
    mut = blob[:ne_pos] + struct.pack("<Q", 30) + blob[ne_pos + 8:]
    with pytest.raises(ValueError, match="divisible"):
        parse_gguf_header(mut)


def test_kquant_sizes_census_only():
    # K-quants have known sizes (census works) but no decoder (seam)
    assert GGML_TYPES[14] == ("Q6_K", 256, 210)
    with pytest.raises(NotImplementedError, match="seam"):
        decode_tensor(b"\x00" * 210, "Q6_K", 256)


def test_every_byte_mutation_detected_or_value_change():
    """Header-byte mutation sweep: flipping any byte of the header
    region either raises a contract ValueError or changes parsed
    values — never a silent identical parse with corrupt framing."""
    blob, _, _ = _sample_blob()
    ref = parse_gguf_header(blob)
    _, _, base = ref
    flips = 0
    for pos in range(base):
        mut = bytearray(blob)
        mut[pos] ^= 0xFF
        try:
            got = parse_gguf_header(bytes(mut))
        except (ValueError, NotImplementedError):
            continue
        assert got != ref, f"silent accept of flipped byte {pos}"
        flips += 1
    # most header bytes are load-bearing enough to raise
    assert flips < base * 0.5


def test_spark_index_and_metadata(spark, tmp_path):
    blob, _, _ = _sample_blob()
    (tmp_path / "m.gguf").write_bytes(blob)
    idx = read_gguf_index(spark, str(tmp_path)).toPandas()
    assert set(idx["tensor"]) == {"t.f32", "t.q8", "t.q4", "t.bf16"}
    assert int(idx[idx.tensor == "t.q8"]["n_bytes"].iloc[0]) == 68
    meta = read_gguf_metadata(spark, str(tmp_path)).toPandas()
    kv = dict(zip(meta["key"], meta["value_json"]))
    assert kv["ctx"] == "4096"
    assert kv["names"] == '["a","b"]'


def test_spark_corrupt_shard_quarantined_whole(spark, tmp_path):
    blob, _, _ = _sample_blob()
    (tmp_path / "good.gguf").write_bytes(blob)
    (tmp_path / "bad.gguf").write_bytes(blob[:40])
    with pytest.raises(Exception, match="corrupt gguf"):
        read_gguf_index(spark, str(tmp_path)).collect()
    idx = read_gguf_index(spark, str(tmp_path), on_error="skip").toPandas()
    assert set(idx["shard"].map(lambda p: p.rsplit("/", 1)[-1])) == {
        "good.gguf"}
    assert len(idx) == 4


def test_spark_vector_roundtrip_f32_and_q8(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i) + j / 10 for j in range(32)]) for i in range(20)],
        "vec_id long, embedding array<float>")
    out32 = tmp_path / "f32"
    write_gguf_vectors(df, str(out32), ggml_type="F32")
    back = read_gguf_vectors(spark, str(out32)).toPandas()
    assert sorted(back["vec_id"]) == list(range(20))
    orig = {i: [float(i) + j / 10 for j in range(32)] for i in range(20)}
    for _, row in back.iterrows():
        assert np.allclose(row["embedding"], orig[row["vec_id"]],
                           rtol=0, atol=1e-6)
    # quantized export: reconstruction within the Q8_0 step bound
    outq = tmp_path / "q8"
    write_gguf_vectors(df, str(outq), ggml_type="Q8_0")
    backq = read_gguf_vectors(spark, str(outq)).toPandas()
    for _, row in backq.iterrows():
        ref = np.asarray(orig[row["vec_id"]], dtype=np.float32)
        step = np.abs(ref).max() / 127
        assert np.abs(np.asarray(row["embedding"]) - ref).max() <= step


def test_gguf_census_streaming_twin_matches_batch(spark, tmp_path):
    """read_gguf_index_stream shares the batch header walk: checkpoint
    shards dropped into a directory census out as the batch rows."""
    from wc_vector_indexing_spark.sources.gguf import read_gguf_index_stream

    blob, _, _ = _sample_blob()
    (tmp_path / "m0.gguf").write_bytes(blob)
    (tmp_path / "m1.gguf").write_bytes(blob)
    q = (
        read_gguf_index_stream(spark, str(tmp_path / "*.gguf"))
        .writeStream.format("memory")
        .queryName("gguf_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = spark.sql(
        "SELECT tensor, ggml_type, n_bytes FROM gguf_stream_out").collect()
    batch = read_gguf_index(spark, str(tmp_path / "*.gguf")).select(
        "tensor", "ggml_type", "n_bytes").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) == 8


def test_tokenizer_extraction_and_prefix_read(tmp_path):
    from wc_vector_indexing_spark.sources.gguf import (
        read_gguf_header_prefix,
        read_gguf_tokenizer,
    )

    vocab = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
        "th", "ing", "<unk>", "th"]  # duplicate piece: best score wins
    scores = [-4.0] * 26 + [-1.0, -1.5, -10.0, -3.0]
    p = tmp_path / "tok.gguf"
    p.write_bytes(to_gguf_bytes(
        {"tokenizer.ggml.model": "unigram",
         "tokenizer.ggml.tokens": vocab,
         "tokenizer.ggml.scores": scores},
        [("tok.embd", np.zeros(32, dtype=np.float32), "F32")]))
    logp = read_gguf_tokenizer(str(p))
    assert len(logp) == 29
    assert logp["th"] == -1.0  # duplicate kept the BEST score
    assert logp["ing"] == -1.5
    # the loaded vocab drives the repo's own Viterbi
    from wc_vector_indexing_spark.operators.unigram_lm import (
        viterbi_segment,
    )
    assert viterbi_segment("thing", logp) == ["th", "ing"]
    # prefix read with a tiny initial window exercises the doubling
    # loop and skips the data-region checks
    meta, infos, base = read_gguf_header_prefix(str(p), initial_bytes=16)
    assert meta["tokenizer.ggml.tokens"] == vocab
    assert infos[0]["tensor"] == "tok.embd"


def test_tokenizer_extraction_contract(tmp_path):
    from wc_vector_indexing_spark.sources.gguf import read_gguf_tokenizer

    # no tokenizer at all
    p = tmp_path / "bare.gguf"
    p.write_bytes(to_gguf_bytes({"general.architecture": "x"}, []))
    with pytest.raises(ValueError, match="tokenizer.ggml.tokens"):
        read_gguf_tokenizer(str(p))
    # BPE merges without scores is an explicit seam
    p2 = tmp_path / "bpe.gguf"
    p2.write_bytes(to_gguf_bytes(
        {"tokenizer.ggml.tokens": ["a"],
         "tokenizer.ggml.merges": ["a b"]}, []))
    with pytest.raises(NotImplementedError, match="seam"):
        read_gguf_tokenizer(str(p2))
    # length mismatch is corruption
    p3 = tmp_path / "mis.gguf"
    p3.write_bytes(to_gguf_bytes(
        {"tokenizer.ggml.tokens": ["a", "b"],
         "tokenizer.ggml.scores": [-1.0]}, []))
    with pytest.raises(ValueError, match="mismatch"):
        read_gguf_tokenizer(str(p3))
