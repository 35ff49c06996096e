"""TFRecord source/sink (sources/tfrecord.py): CRC-32C known answers,
Example wire-codec roundtrips, framing integrity (both CRCs verified),
and the Spark read/write halves composing losslessly."""

from __future__ import annotations

import struct

import pytest

from wc_vector_indexing_spark.sources.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    frame_record,
    iter_tfrecord,
    masked_crc32c,
    read_tfrecords,
    to_tfrecord_bytes,
    write_tfrecords,
)


# ------------------------------------------------------------- CRC-32C

def test_crc32c_known_answers():
    # RFC 3720 B.4 / published Castagnoli check values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_masked_crc_matches_tf_formula():
    crc = crc32c(b"hello")
    expect = (((crc >> 15) | ((crc << 17) & 0xFFFFFFFF)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"hello") == expect


# ----------------------------------------------------- Example wire codec

def test_example_roundtrip_all_kinds():
    feats = {
        "text": ("bytes", ["héllo wörld", b"\x00\x01raw"]),
        "ids": ("int64", [0, 1, -5, 2**62, -(2**62)]),
        "emb": ("float", [0.5, -1.25, 3.0]),
        "empty": ("int64", []),
    }
    back = decode_example(encode_example(feats))
    assert back["text"] == ("bytes", ["héllo wörld".encode(), b"\x00\x01raw"])
    assert back["ids"] == ("int64", [0, 1, -5, 2**62, -(2**62)])
    assert back["emb"][0] == "float"
    assert back["emb"][1] == [0.5, -1.25, 3.0]  # exactly representable
    # absent-list Feature decodes as empty (oneof not set ≡ empty list)
    assert back["empty"][1] == []


def test_decode_skips_unknown_fields():
    # append an unknown varint field (field 9) at the Example level —
    # protobuf forward compatibility: must be skipped, not an error
    buf = encode_example({"a": ("int64", [7])}) + bytes([9 << 3 | 0, 42])
    assert decode_example(buf)["a"] == ("int64", [7])


def test_decode_garbage_is_contract_error():
    with pytest.raises(ValueError):
        list(iter_tfrecord(b"\x01\x02\x03"))
    with pytest.raises(ValueError):
        decode_example(bytes([1 << 3 | 2, 200]))  # length past end


# --------------------------------------------------------------- framing

def test_framing_roundtrip_and_crc_detection():
    payloads = [b"alpha", b"", b"x" * 1000]
    stream = b"".join(frame_record(p) for p in payloads)
    assert list(iter_tfrecord(stream)) == payloads

    # flip one payload byte -> data CRC mismatch, contract error
    bad = bytearray(stream)
    bad[12] ^= 0x01  # first byte of first payload
    with pytest.raises(ValueError, match="data CRC"):
        list(iter_tfrecord(bytes(bad)))

    # corrupt the length field -> length CRC catches it BEFORE the
    # bogus length is trusted (a 2^60 length must not allocate)
    bad = bytearray(stream)
    bad[7] = 0x10
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_tfrecord(bytes(bad)))


# ----------------------------------------------------------- Spark halves

def _docs(spark, n=20):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "concat('text-', id) AS text",
        "array(cast(id AS float) * 0.5, 1.0) AS emb",
    )


def test_spark_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "tfr")
    df = _docs(spark).repartition(3)
    manifest = write_tfrecords(df, out)
    rows = manifest.collect()
    assert sum(r.n_records for r in rows) == 20
    assert 1 <= len(rows) <= 3

    back = read_tfrecords(
        spark, out,
        {"doc_id": "int64", "text": "string", "emb": "float_list"},
    )
    got = sorted(
        (r.doc_id, r.text, tuple(r.emb)) for r in back.collect()
    )
    assert got == [(i, f"text-{i}", (i * 0.5, 1.0)) for i in range(20)]


def test_spark_reader_on_error_skip(spark, tmp_path):
    out = tmp_path / "tfr"
    out.mkdir()
    good = to_tfrecord_bytes(
        [{"doc_id": ("int64", [i])} for i in range(5)])
    (out / "part-0.tfrecord").write_bytes(good)
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # break the final data CRC
    (out / "part-1.tfrecord").write_bytes(bytes(bad))

    spec = {"doc_id": "int64"}
    with pytest.raises(Exception, match="corrupt TFRecord"):
        read_tfrecords(spark, str(out), spec).count()
    kept = read_tfrecords(spark, str(out), spec, on_error="skip")
    # corrupt shard dropped WHOLE — not the records before the bad one
    assert kept.count() == 5
    assert {r.doc_id for r in kept.collect()} == set(range(5))


def test_scalar_vs_list_spec_and_missing_feature(spark, tmp_path):
    out = tmp_path / "tfr"
    out.mkdir()
    recs = [
        {"a": ("int64", [1, 2, 3]), "t": ("bytes", ["x"])},
        {"a": ("int64", [9])},  # t absent -> null scalar
    ]
    (out / "p.tfrecord").write_bytes(to_tfrecord_bytes(recs))
    got = (
        read_tfrecords(spark, str(out),
                       {"a": "int64_list", "t": "string"})
        .orderBy("record_index").collect()
    )
    assert [list(r.a) for r in got] == [[1, 2, 3], [9]]
    assert [r.t for r in got] == ["x", None]


def test_written_framing_is_spec_exact(spark, tmp_path):
    """The shard bytes must follow the public framing byte-for-byte:
    re-parse the header fields with raw struct, independently of
    iter_tfrecord."""
    out = str(tmp_path / "tfr")
    write_tfrecords(_docs(spark, 3).coalesce(1), out)
    import glob

    (shard,) = glob.glob(out + "/part-*.tfrecord")
    data = open(shard, "rb").read()
    (length,) = struct.unpack_from("<Q", data, 0)
    (lcrc,) = struct.unpack_from("<I", data, 8)
    assert lcrc == masked_crc32c(data[:8])
    (dcrc,) = struct.unpack_from("<I", data, 12 + length)
    assert dcrc == masked_crc32c(data[12:12 + length])


def test_packed_sequences_export_to_tfrecord(spark, tmp_path):
    """The last mile of a training pipeline: packed model-input
    sequences (operators/packing.pack_encoded shape) written as
    TFRecord shards and read back losslessly — int64_list seq, scalar
    metadata — i.e. the engine's curation output feeds a tf.data
    loader with no bridge code."""
    from pyspark.sql import functions as F

    packed = spark.range(8).select(
        F.lit("web").alias("group"),
        F.col("id").alias("bin_id"),
        (F.col("id") % 3 + 1).alias("n_docs"),
        F.sequence(F.lit(0), F.col("id") + 2).alias("seq"),
    )
    out = str(tmp_path / "packed_tfr")
    manifest = write_tfrecords(packed.repartition(2), out)
    assert sum(r.n_records for r in manifest.collect()) == 8

    back = read_tfrecords(
        spark, out,
        {"group": "string", "bin_id": "int64",
         "n_docs": "int64", "seq": "int64_list"},
    )
    got = {r.bin_id: (r.group, r.n_docs, list(r.seq)) for r in back.collect()}
    assert got == {
        i: ("web", i % 3 + 1, list(range(i + 3))) for i in range(8)
    }


def test_streaming_twin_matches_batch(spark, tmp_path):
    """read_tfrecords_stream shares the batch parse pass: shards
    dropped into a directory stream out as exactly the batch rows."""
    from wc_vector_indexing_spark.sources.tfrecord import read_tfrecords_stream

    out = tmp_path / "tfr"
    out.mkdir()
    for s in range(3):
        recs = [{"doc_id": ("int64", [s * 10 + i]),
                 "text": ("bytes", [f"t-{s}-{i}"])} for i in range(4)]
        (out / f"part-{s}.tfrecord").write_bytes(to_tfrecord_bytes(recs))

    spec = {"doc_id": "int64", "text": "string"}
    q = (
        read_tfrecords_stream(spark, str(out / "*.tfrecord"), spec)
        .writeStream.format("memory")
        .queryName("tfr_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = spark.sql(
        "SELECT doc_id, text FROM tfr_stream_out").collect()
    batch = read_tfrecords(spark, str(out / "*.tfrecord"), spec) \
        .select("doc_id", "text").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) == 12


def test_vectorized_crc_equals_bytewise_and_combines():
    """The numpy lane kernel + GF(2) tree fold must equal the reference
    byte loop at every size class (below/at/past the vector threshold,
    word-aligned and not), and the zero-extension combine must satisfy
    crc(A||B) == combine(crc(A), crc(B), |B|)."""
    import random

    from wc_vector_indexing_spark.sources.tfrecord import (
        _crc32c_bytewise,
        crc32c_combine,
    )

    rng = random.Random(42)
    for n in (0, 1, 3, 4095, 4096, 4097, 4100, 65536, 70003,
              (1 << 20) + 37):
        data = rng.randbytes(n)
        assert crc32c(data) == _crc32c_bytewise(data) ^ 0xFFFFFFFF, n
    for la, lb in ((1, 1), (4096, 4096), (12345, 1), (100000, 99999)):
        a, b = rng.randbytes(la), rng.randbytes(lb)
        assert crc32c_combine(crc32c(a), crc32c(b), lb) == crc32c(a + b)


def test_write_nullable_int_column(spark, tmp_path):
    """A NULL in a nullable long column arrives in pandas as float NaN;
    the writer must emit an empty Int64List (feature present, no
    values), not crash on int(nan)."""
    out = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None)], "doc_id long, text string")
    manifest = write_tfrecords(df.coalesce(1), out)
    assert manifest.collect()[0].n_records == 3
    back = read_tfrecords(
        spark, f"{out}/part-*.tfrecord",
        {"doc_id": "int64", "text": "string"})
    got = sorted(((r.doc_id, r.text) for r in back.collect()),
                 key=str)
    assert got == sorted([(1, "a"), (None, "b"), (3, None)], key=str)


def test_write_null_array_element_is_contract_error(spark, tmp_path):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [1, None, 3])], "doc_id long, toks array<long>")
    with _pytest.raises(Exception, match="null element in array column"):
        write_tfrecords(df.coalesce(1), str(tmp_path / "bad"))


def test_partitioned_writer_hive_layout(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        spark.range(24)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 2)).alias("source"),
            F.concat(F.lit("d"), F.col("id")).alias("text"),
        )
    )
    out = str(tmp_path / "hive")
    manifest = write_tfrecords(df, out, partition_by=["source"])
    man = manifest.collect()
    assert sum(r.n_records for r in man) == 24
    assert {r.shard.split("/")[-2] for r in man} == {"source=s0",
                                                     "source=s1"}
    back = read_tfrecords(
        spark, f"{out}/source=s0/part-*.tfrecord",
        {"doc_id": "int64", "text": "string"})
    rows = back.collect()
    assert sorted(r.doc_id for r in rows) == list(range(0, 24, 2))
    # payload excludes the partition column (hive convention)
    from wc_vector_indexing_spark.sources.tfrecord import (
        decode_example,
        iter_tfrecord,
    )
    import glob as _glob

    with open(_glob.glob(f"{out}/source=s0/part-*.tfrecord")[0], "rb") as fh:
        ex = decode_example(next(iter_tfrecord(fh.read())))
    assert "source" not in ex
