"""The .zst text/JSONL source: shard-parallel decode, line framing,
JVM-side JSON extraction, and corrupt-shard quarantine."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from wc_vector_indexing_spark.sources.zstd_text import (
    read_zstd_jsonl,
    read_zstd_lines,
)


def _shard(tmp_path, name: str, lines: list[str]) -> None:
    blob = ("\n".join(lines) + "\n").encode("utf-8")
    comp = bytes(pa.Codec("zstd", compression_level=3).compress(blob))
    (tmp_path / name).write_bytes(comp)


def test_read_lines_order_and_framing(spark, tmp_path):
    _shard(tmp_path, "a.zst", ["one", "two", ""])
    _shard(tmp_path, "b.zst", ["three"])
    rows = read_zstd_lines(spark, str(tmp_path / "*.zst")).collect()
    got = sorted((r.path.rsplit("/", 1)[-1], r.line_no, r.line)
                 for r in rows)
    # the empty interior line survives; only the trailing \n is framing
    assert got == [("a.zst", 0, "one"), ("a.zst", 1, "two"),
                   ("a.zst", 2, ""), ("b.zst", 0, "three")]


def test_read_jsonl_fields_and_escapes(spark, tmp_path):
    recs = [{"id": 1, "text": "line one\nline two"},
            {"id": 2, "text": 'quotes " and unicode é'}]
    _shard(tmp_path, "d.zst", [json.dumps(r) for r in recs])
    rows = (read_zstd_jsonl(spark, str(tmp_path / "d.zst"),
                            {"id": "long", "text": "string"})
            .orderBy("id").collect())
    assert [(r.id, r.text) for r in rows] == [
        (1, "line one\nline two"), (2, 'quotes " and unicode é')]


def test_corrupt_shard_quarantine(spark, tmp_path):
    _shard(tmp_path, "ok.zst", ["good"])
    (tmp_path / "bad.zst").write_bytes(b"\x28\xb5\x2f\xfd garbage!!")
    with pytest.raises(Exception):
        read_zstd_lines(spark, str(tmp_path / "*.zst"),
                        on_error="raise").collect()
    rows = read_zstd_lines(spark, str(tmp_path / "*.zst"),
                           on_error="skip").collect()
    assert [(r.line,) for r in rows] == [("good",)]


def test_streaming_twin_matches_batch(spark, tmp_path):
    """read_zstd_lines_stream shares the batch decode pass: shards
    dropped into a directory stream out as exactly the batch rows."""
    import pyarrow as pa

    from wc_vector_indexing_spark.sources.zstd_text import (
        read_zstd_lines,
        read_zstd_lines_stream,
    )

    out = tmp_path / "zst"
    out.mkdir()
    for s in range(3):
        payload = "".join(f"shard {s} line {i}\n" for i in range(5))
        blob = bytes(pa.Codec("zstd").compress(payload.encode()))
        (out / f"part-{s}.zst").write_bytes(blob)

    q = (
        read_zstd_lines_stream(spark, str(out / "*.zst"))
        .writeStream.format("memory")
        .queryName("zst_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = spark.sql(
        "SELECT path, line_no, line FROM zst_stream_out").collect()
    batch = read_zstd_lines(spark, str(out / "*.zst")).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) == 15
