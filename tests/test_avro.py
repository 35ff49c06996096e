"""Avro object-container source (sources/avro.py): binary-encoding
roundtrips, container framing (sync markers, codecs), contract-error
surface, and the Spark reader's typed ingest + per-file isolation."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.sources.avro import (
    parse_avro_file,
    read_avro,
    to_avro_bytes,
)

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "ok", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "emb", "type": {"type": "array", "items": "double"}},
        {"name": "blob", "type": "bytes"},
    ],
}


def _rows(n=7):
    return [
        {
            "doc_id": i,
            "text": f"tëxt-{i}",
            "lang": None if i % 3 == 0 else f"l{i % 2}",
            "ok": i % 2 == 0,
            "score": i * 0.25,
            "emb": [i * 0.5, -float(i)],
            "blob": bytes([i, 255 - i]),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    rows = _rows()
    schema, back = parse_avro_file(to_avro_bytes(SCHEMA, rows, codec=codec))
    assert schema == SCHEMA
    assert back == rows


def test_multi_block_and_negative_longs():
    rows = [{"doc_id": v, "text": "", "lang": None, "ok": False,
             "score": 0.0, "emb": [], "blob": b""}
            for v in (0, -1, 1, -(2**62), 2**62)]
    _, back = parse_avro_file(
        to_avro_bytes(SCHEMA, rows, max_block_records=2))
    assert [r["doc_id"] for r in back] == [0, -1, 1, -(2**62), 2**62]


def test_bad_magic_sync_and_codec_are_contract_errors():
    data = to_avro_bytes(SCHEMA, _rows(3))
    with pytest.raises(ValueError, match="magic"):
        parse_avro_file(b"NOPE" + data[4:])
    # corrupt the trailing block sync marker
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        parse_avro_file(bytes(bad))


def test_unsupported_schema_is_contract_seam():
    with pytest.raises(NotImplementedError):
        to_avro_bytes({"type": "record", "name": "x", "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}}]}, [])
    with pytest.raises(NotImplementedError):
        to_avro_bytes({"type": "record", "name": "x", "fields": [
            {"name": "a", "type": {"type": "array", "items": "null"}}]}, [])


def test_spark_reader_typed_ingest(spark, tmp_path):
    rows = _rows(10)
    (tmp_path / "s0.avro").write_bytes(to_avro_bytes(SCHEMA, rows[:6]))
    (tmp_path / "s1.avro").write_bytes(
        to_avro_bytes(SCHEMA, rows[6:], codec="null"))
    df = read_avro(spark, str(tmp_path / "*.avro"), SCHEMA)
    got = {r.doc_id: r for r in df.collect()}
    assert len(got) == 10
    r3 = got[3]
    assert r3.text == "tëxt-3" and r3.lang is None and r3.ok is False
    assert r3.score == 0.75 and list(r3.emb) == [1.5, -3.0]
    assert bytes(r3.blob) == bytes([3, 252])
    assert got[4].lang == "l0"
    # shard lineage rides every row
    assert {r.avro_path.rsplit("/", 1)[-1] for r in got.values()} == {
        "s0.avro", "s1.avro"}


def test_spark_reader_on_error_skip_and_schema_mismatch(spark, tmp_path):
    rows = _rows(6)
    (tmp_path / "good.avro").write_bytes(to_avro_bytes(SCHEMA, rows[:4]))
    bad = bytearray(to_avro_bytes(SCHEMA, rows[4:]))
    bad[len(bad) // 2] ^= 0x55  # interior corruption
    (tmp_path / "bad.avro").write_bytes(bytes(bad))

    with pytest.raises(Exception, match="corrupt avro"):
        read_avro(spark, str(tmp_path / "*.avro"), SCHEMA).count()
    kept = read_avro(spark, str(tmp_path / "*.avro"), SCHEMA, on_error="skip")
    assert {r.doc_id for r in kept.collect()} == {0, 1, 2, 3}

    # a reader field the writer never had and no default: unresolvable
    other = {"type": "record", "name": "doc",
             "fields": [{"name": "doc_id", "type": "long"},
                        {"name": "added", "type": "long"}]}
    with pytest.raises(Exception, match="no default"):
        read_avro(spark, str(tmp_path / "good.avro"), other).count()


def test_schema_resolution_projection_default_and_promotion_seam(spark, tmp_path):
    """Avro spec schema resolution: narrower reader schemas PROJECT
    (writer-only fields dropped), reader-added fields take their
    declared default, and type promotion stays a contract seam."""
    (tmp_path / "old.avro").write_bytes(to_avro_bytes(SCHEMA, _rows(4)))

    evolved = {
        "type": "record", "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": "string"},
            {"name": "split", "type": "string", "default": "train"},
            {"name": "weight", "type": "double", "default": 1.0},
        ],
    }
    got = {r.doc_id: r for r in
           read_avro(spark, str(tmp_path / "old.avro"), evolved).collect()}
    assert len(got) == 4
    assert got[2].text == "tëxt-2"
    assert got[2].split == "train" and got[2].weight == 1.0
    # writer-only fields (lang/ok/score/emb/blob) are gone
    assert "emb" not in got[2].asDict()

    promoted = {"type": "record", "name": "doc",
                "fields": [{"name": "doc_id", "type": "double"}]}
    with pytest.raises(Exception, match="promotion"):
        read_avro(spark, str(tmp_path / "old.avro"), promoted).count()


def test_streaming_twin_matches_batch(spark, tmp_path):
    """read_avro_stream shares the batch parse pass: container drops
    stream out as exactly the batch rows."""
    from wc_vector_indexing_spark.sources.avro import read_avro_stream

    rows = _rows(9)
    (tmp_path / "d0.avro").write_bytes(to_avro_bytes(SCHEMA, rows[:5]))
    (tmp_path / "d1.avro").write_bytes(
        to_avro_bytes(SCHEMA, rows[5:], codec="null"))

    q = (
        read_avro_stream(spark, str(tmp_path / "*.avro"), SCHEMA)
        .writeStream.format("memory")
        .queryName("avro_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = spark.sql(
        "SELECT doc_id, text, lang FROM avro_stream_out").collect()
    batch = read_avro(spark, str(tmp_path / "*.avro"), SCHEMA) \
        .select("doc_id", "text", "lang").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) == 9


def test_distributed_write_read_roundtrip(spark, tmp_path):
    """Egress half: one container per partition, schema derived from
    the DataFrame, nulls (incl. Arrow's NaN-for-null integers) and
    arrays surviving the roundtrip."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.avro import schema_for, write_avro

    df = (
        spark.range(14)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id")).alias("text"),
            F.when(F.col("id") % 3 == 0, F.col("id") * 2).alias("maybe"),
            F.array(F.col("id") * 0.5, F.lit(1.0)).alias("emb"),
        )
        .repartition(3)
    )
    out = str(tmp_path / "avro_out")
    manifest = write_avro(df, out)
    assert sum(r.n_records for r in manifest.collect()) == 14

    back = read_avro(spark, out + "/part-*.avro", schema_for(df))
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == 14
    assert got[3].maybe == 6 and got[4].maybe is None
    assert list(got[5].emb) == [2.5, 1.0]
    assert got[7].text == "t7"


def test_logical_types_fall_back_to_base(spark, tmp_path):
    """Spec rule: a reader without the logical type uses the base type
    — foreign files with timestamp-micros/date/uuid annotations must
    read as plain long/int/string, not hit the unsupported seam."""
    schema = {
        "type": "record", "name": "evt",
        "fields": [
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {"name": "uid", "type": ["null", {"type": "string",
                                              "logicalType": "uuid"}]},
        ],
    }
    rows = [{"ts": 1_700_000_000_000_000 + i, "day": 19_000 + i,
             "uid": None if i == 0 else f"u-{i}"} for i in range(3)]
    data = to_avro_bytes(schema, rows)
    got_schema, back = parse_avro_file(data)
    assert back == rows and got_schema == schema
    (tmp_path / "evt.avro").write_bytes(data)
    df = read_avro(spark, str(tmp_path / "evt.avro"), schema)
    got = sorted((r.ts, r.day, r.uid) for r in df.collect())
    assert got == [(r["ts"], r["day"], r["uid"]) for r in rows]


def test_write_null_array_element_is_contract_error(spark, tmp_path):
    """A null element in an INTEGRAL array is corrupt input (Avro
    array<long> has no null item) -> contract error, not int(nan). In
    a FLOAT array the null merges to NaN (documented lossy corner,
    same as scalar float columns)."""
    from wc_vector_indexing_spark.sources.avro import (
        parse_avro_file,
        write_avro,
    )

    df = spark.createDataFrame(
        [(1, [1, None, 3])], "doc_id long, toks array<long>")
    with pytest.raises(Exception, match="null element in array column"):
        write_avro(df.coalesce(1), str(tmp_path / "bad"))

    fdf = spark.createDataFrame(
        [(1, [0.5, None])], "doc_id long, emb array<double>")
    out = str(tmp_path / "floats")
    write_avro(fdf.coalesce(1), out)
    import glob as _glob

    with open(_glob.glob(f"{out}/part-*.avro")[0], "rb") as fh:
        _, rows = parse_avro_file(fh.read())
    assert rows[0]["emb"][0] == 0.5 and rows[0]["emb"][1] != rows[0]["emb"][1]


def test_iter_container_chunks_equal_eager_bytes():
    """The streaming writer path must be byte-identical to the eager
    one (same blocks, same sync markers)."""
    from wc_vector_indexing_spark.sources.avro import iter_avro_container

    rows = _rows(9)
    for codec in ("null", "deflate"):
        eager = to_avro_bytes(SCHEMA, rows, codec=codec,
                              max_block_records=4)
        chunks = list(iter_avro_container(SCHEMA, iter(rows), codec=codec,
                                          max_block_records=4))
        assert len(chunks) == 1 + 3  # header + ceil(9/4) blocks
        assert b"".join(chunks) == eager
