"""Arrow IPC source/sink (sources/arrow_ipc.py): codec roundtrips in
both encodings and compressions, reader-schema safe-cast semantics,
contract-error surface, the Spark reader's typed ingest + per-file
isolation, and the distributed one-shard-per-task sink."""

from __future__ import annotations

import os

import pytest

from wc_vector_indexing_spark.sources.arrow_ipc import (
    parse_arrow_file,
    read_arrow_ipc,
    to_arrow_ipc_bytes,
    write_arrow_ipc,
)

TYPES = {
    "doc_id": "long",
    "text": "string",
    "ok": "boolean",
    "score": "double",
    "emb": "array<double>",
    "blob": "binary",
}


def _cols(n=7):
    return {
        "doc_id": list(range(n)),
        "text": [None if i % 3 == 0 else f"tëxt-{i}" for i in range(n)],
        "ok": [i % 2 == 0 for i in range(n)],
        "score": [i * 0.25 for i in range(n)],
        "emb": [[i * 0.5, -float(i)] for i in range(n)],
        "blob": [bytes([i, 255 - i]) for i in range(n)],
    }


@pytest.mark.parametrize("fmt", ["file", "stream"])
@pytest.mark.parametrize("compression", [None, "zstd", "lz4"])
def test_codec_roundtrip(fmt, compression):
    cols = _cols()
    data = to_arrow_ipc_bytes(cols, TYPES, fmt=fmt, compression=compression,
                              max_rows_per_batch=3)
    out = parse_arrow_file(data, TYPES)
    assert [i for i, _ in out] == [0, 1, 2]  # 7 rows / 3-row batches
    import pandas as pd

    pdf = pd.concat([p for _, p in out], ignore_index=True)
    assert pdf["doc_id"].tolist() == cols["doc_id"]
    assert [None if v is None else v for v in pdf["text"]] == cols["text"]
    assert pdf["score"].tolist() == cols["score"]
    assert [list(v) for v in pdf["emb"]] == cols["emb"]
    assert pdf["blob"].tolist() == cols["blob"]


def test_reader_schema_projection_and_safe_cast():
    # file carries int32 + extra column; reader asks for long and
    # prunes the rest
    data = to_arrow_ipc_bytes(
        {"x": [1, 2], "extra": ["a", "b"]}, {"x": "int", "extra": "string"})
    out = parse_arrow_file(data, {"x": "long"})
    assert out[0][1].columns.tolist() == ["x"]
    assert out[0][1].x.tolist() == [1, 2]


def test_unsafe_cast_and_missing_column_are_contract_errors():
    data = to_arrow_ipc_bytes({"x": [1.5]}, {"x": "double"})
    with pytest.raises(ValueError):
        parse_arrow_file(data, {"x": "long"})  # lossy double->long
    with pytest.raises(ValueError):
        parse_arrow_file(data, {"y": "long"})  # absent column
    with pytest.raises(NotImplementedError):
        parse_arrow_file(data, {"x": "map<string,string>"})  # unsupported


def test_garbage_and_wrong_magic_are_contract_errors():
    for junk in (b"", b"ARROW1" + b"\x00" * 8, b"\xff\xff\xff\xff junk!",
                 b"PAR1not arrow at all"):
        with pytest.raises(ValueError):
            parse_arrow_file(junk, {"x": "long"})


def test_spark_reader_both_encodings(spark, tmp_path):
    cols = _cols(10)
    (tmp_path / "part-0.arrow").write_bytes(
        to_arrow_ipc_bytes(cols, TYPES, fmt="file", compression="zstd",
                           max_rows_per_batch=4))
    (tmp_path / "part-1.arrow").write_bytes(
        to_arrow_ipc_bytes(cols, TYPES, fmt="stream", compression=None))
    df = read_arrow_ipc(spark, str(tmp_path / "part-*.arrow"), TYPES)
    rows = df.collect()
    assert len(rows) == 20
    assert {os.path.basename(r.arrow_path).split("-")[1][:1]
            for r in rows} == {"0", "1"}
    # batch_index lineage: shard 0 was written in 4-row batches
    s0 = [r for r in rows if r.arrow_path.endswith("part-0.arrow")]
    assert {r.batch_index for r in s0} == {0, 1, 2}
    by_id = {r.doc_id: r for r in s0}
    assert by_id[4].text == "tëxt-4" and by_id[3].text is None
    assert by_id[2].emb == [1.0, -2.0] and by_id[2].blob == bytes([2, 253])


def test_spark_reader_exact_big_ints_beside_nulls(spark, tmp_path):
    """A nullable long column must not take the pandas float64 detour:
    2**53 + 1 is not float-representable and would silently round."""
    big = 2**53 + 1
    data = to_arrow_ipc_bytes({"x": [big, None, -big]}, {"x": "long"})
    (tmp_path / "p.arrow").write_bytes(data)
    rows = read_arrow_ipc(
        spark, str(tmp_path / "p.arrow"), {"x": "long"}).collect()
    assert sorted((r.x for r in rows), key=lambda v: (v is None, v)) == [
        -big, big, None]


def test_spark_reader_per_file_isolation(spark, tmp_path):
    good = to_arrow_ipc_bytes({"x": [1, 2]}, {"x": "long"})
    (tmp_path / "good.arrow").write_bytes(good)
    (tmp_path / "bad.arrow").write_bytes(good[: len(good) // 2])
    path = str(tmp_path / "*.arrow")
    with pytest.raises(Exception, match="corrupt arrow shard"):
        read_arrow_ipc(spark, path, {"x": "long"}).collect()
    kept = read_arrow_ipc(spark, path, {"x": "long"}, on_error="skip")
    assert [r.x for r in kept.orderBy("x").collect()] == [1, 2]


def test_distributed_writer_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        spark.range(40)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.concat(F.lit("d"), F.col("id"))).alias("text"),
            (F.col("id") * 0.5).alias("score"),
            F.array(F.col("id"), F.col("id") + 1).alias("toks"),
        )
        .repartition(3)
    )
    out = str(tmp_path / "shards")
    manifest = write_arrow_ipc(df, out, compression="zstd")
    man = manifest.collect()
    assert sum(r.n_records for r in man) == 40 and len(man) == 3
    back = read_arrow_ipc(
        spark, os.path.join(out, "part-*.arrow"),
        {"doc_id": "long", "text": "string", "score": "double",
         "toks": "array<long>"},
    )
    rows = {r.doc_id: r for r in back.collect()}
    assert len(rows) == 40
    assert rows[5].text is None and rows[7].text == "d7"
    assert rows[6].score == 3.0 and rows[6].toks == [6, 7]


def test_streaming_twin_matches_batch(spark, tmp_path):
    from wc_vector_indexing_spark.sources.arrow_ipc import (
        read_arrow_ipc_stream,
    )

    cols = {"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}
    types = {"doc_id": "long", "text": "string"}
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "part-0.arrow").write_bytes(to_arrow_ipc_bytes(cols, types))
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = (
        read_arrow_ipc_stream(spark, str(drop), types)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text) for r in got] == [(1, "a"), (2, "b"), (3, "c")]


def test_partitioned_writer_hive_layout(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        spark.range(30)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 3)).alias("source"),
            F.concat(F.lit("d"), F.col("id")).alias("text"),
        )
    )
    out = str(tmp_path / "hive")
    manifest = write_arrow_ipc(df, out, partition_by=["source"])
    man = manifest.collect()
    assert sum(r.n_records for r in man) == 30
    assert {r.shard.split("/")[-2] for r in man} == {
        "source=s0", "source=s1", "source=s2"}
    # payload excludes the partition column; readers recover it from
    # the path
    back = read_arrow_ipc(
        spark, os.path.join(out, "source=s1", "part-*.arrow"),
        {"doc_id": "long", "text": "string"},
    )
    rows = back.collect()
    assert sorted(r.doc_id for r in rows) == [1, 4, 7, 10, 13, 16, 19,
                                              22, 25, 28]
    with pytest.raises(Exception, match="arrow shard lacks reader columns"):
        read_arrow_ipc(spark, os.path.join(out, "source=s1", "part-*.arrow"),
                       {"source": "string"}).collect()


def test_partitioned_writer_null_and_escaped_values(spark, tmp_path):
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(doc_id=1, lang="en/US", text="a"),
        Row(doc_id=2, lang=None, text="b"),
    ])
    out = str(tmp_path / "esc")
    write_arrow_ipc(df, out, partition_by=["lang"])
    dirs = sorted(p.name for p in (tmp_path / "esc").iterdir()
                  if p.is_dir())
    assert dirs == ["lang=__HIVE_DEFAULT_PARTITION__", "lang=en%2FUS"]
