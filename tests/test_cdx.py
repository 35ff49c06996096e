"""ZipNum CDX(J) source: line codec, distributed sorted-shard writer +
cluster.idx emission, full-scan reader, and the block-pruned prefix
lookup (the 100 TB path: index bytes touched must be O(answer), not
O(index))."""

from __future__ import annotations

import gzip
import json
import zlib

import pytest

from wc_vector_indexing_spark.sources.cdx import (
    parse_cdxj_line,
    read_cdxj,
    to_cdxj_line,
    write_zipnum,
    zipnum_blocks_for_range,
    zipnum_lookup,
)


def _capture_df(spark, n=400, hosts=5):
    rows = []
    for i in range(n):
        h = i % hosts
        urlkey = f"example,host{h})/doc/{i:04d}"
        ts = f"2024{i:010d}"
        fields = {"url": f"https://host{h}.example/doc/{i:04d}",
                  "mime": "text/html", "status": 200,
                  "digest": f"sha1:{i}", "filename": "c.warc.gz",
                  "offset": i * 1000, "length": 999}
        rows.append((urlkey, ts, json.dumps(fields)))
    return spark.createDataFrame(
        rows, "urlkey string, ts14 string, fields_json string")


def test_cdxj_line_codec_roundtrip():
    fields = {"url": "https://a.example/p?x=1", "mime": "text/html",
              "status": 200, "digest": "sha1:ABC", "filename": "w.warc.gz",
              "offset": 123, "length": 456}
    line = to_cdxj_line("example,a)/p?x=1", "20240101120000", fields)
    got = parse_cdxj_line(line)
    assert got == ("example,a)/p?x=1", "20240101120000",
                   "https://a.example/p?x=1", "text/html", 200,
                   "sha1:ABC", "w.warc.gz", 123, 456)
    # JSON with spaces inside values still parses (partition on ' {')
    line2 = to_cdxj_line("k)/", "20240101000000", {"url": "a b c"})
    assert parse_cdxj_line(line2)[2] == "a b c"
    with pytest.raises(ValueError, match="no JSON"):
        parse_cdxj_line("key 20240101000000")
    with pytest.raises(ValueError, match="prefix"):
        parse_cdxj_line('key notadigit {"url":"x"}')


def test_write_zipnum_layout_and_cluster_idx(spark, tmp_path):
    out = tmp_path / "zn"
    write_zipnum(_capture_df(spark), str(out),
                 lines_per_block=25, n_shards=3)
    shards = sorted(p.name for p in out.glob("cdx-*.gz"))
    assert len(shards) == 3
    idx_lines = (out / "cluster.idx").read_text().splitlines()
    # 400 lines / 25 per block, plus at most one short tail block per
    # shard (range partitions are not equal-sized)
    assert 16 <= len(idx_lines) <= 16 + 3
    # idx rows are sorted by key and seq is a global running counter
    keys = [ln.split("\t")[0] for ln in idx_lines]
    assert keys == sorted(keys)
    assert ([int(ln.split("\t")[4]) for ln in idx_lines]
            == list(range(len(idx_lines))))
    # every (shard, offset, length) is one exact gzip member holding
    # at most lines_per_block sorted lines
    total = 0
    prev_key = ""
    for ln in idx_lines:
        key, shard, off, length, _ = ln.split("\t")
        raw = (out / shard).read_bytes()[int(off):int(off) + int(length)]
        obj = zlib.decompressobj(31)
        payload = obj.decompress(raw)
        assert obj.eof and not obj.unused_data
        lines = payload.decode().splitlines()
        assert 0 < len(lines) <= 25
        assert lines[0].startswith(key.split(" ")[0])
        block_keys = [f"{l.split(' ')[0]} {l.split(' ')[1]}"
                      for l in lines]
        assert block_keys == sorted(block_keys)
        assert prev_key <= block_keys[0]
        prev_key = block_keys[-1]
        total += len(lines)
    assert total == 400
    # shard files are pure concatenations of their blocks (no gaps)
    for shard in shards:
        covered = sum(int(ln.split("\t")[3]) for ln in idx_lines
                      if ln.split("\t")[1] == shard)
        assert covered == (out / shard).stat().st_size


def test_read_cdxj_full_scan_and_quarantine(spark, tmp_path):
    out = tmp_path / "zn"
    write_zipnum(_capture_df(spark), str(out),
                 lines_per_block=50, n_shards=2)
    df = read_cdxj(spark, str(out / "cdx-*.gz")).toPandas()
    assert len(df) == 400
    assert sorted(df["warc_offset"]) == [i * 1000 for i in range(400)]
    # plain uncompressed .cdxj reads identically
    plain = tmp_path / "plain.cdxj"
    plain.write_text(to_cdxj_line(
        "k)/", "20240101000000", {"url": "u", "offset": 7}) + "\n")
    one = read_cdxj(spark, str(plain)).toPandas()
    assert len(one) == 1 and one["warc_offset"][0] == 7
    # corrupt shard quarantined whole under skip, raises by default
    bad = tmp_path / "bad" ; bad.mkdir()
    (bad / "cdx-00000.gz").write_bytes(
        gzip.compress(b"not a cdxj line at all\n"))
    with pytest.raises(Exception, match="corrupt cdx"):
        read_cdxj(spark, str(bad / "*.gz")).collect()
    assert read_cdxj(spark, str(bad / "*.gz"),
                     on_error="skip").count() == 0


def test_zipnum_lookup_prefix_and_ts_range(spark, tmp_path):
    out = tmp_path / "zn"
    write_zipnum(_capture_df(spark), str(out),
                 lines_per_block=20, n_shards=3)
    got = zipnum_lookup(spark, str(out), "example,host3)/").toPandas()
    assert len(got) == 80
    assert all(k.startswith("example,host3)/") for k in got["urlkey"])
    # ts14 range bounds apply after the prefix cut
    sub = zipnum_lookup(
        spark, str(out), "example,host3)/",
        ts_from=f"2024{100:010d}", ts_to=f"2024{300:010d}").toPandas()
    ids = sorted(int(k[-4:]) for k in sub["urlkey"])
    assert ids == [i for i in range(100, 300) if i % 5 == 3]
    # no-hit prefix returns empty, not an error
    assert zipnum_lookup(spark, str(out), "zzz,nohost)/").count() == 0


def test_zipnum_lookup_prunes_blocks(spark, tmp_path):
    """The scale claim, asserted: a 1-host prefix over 5 hosts touches
    ~1/5 of the blocks (+1 boundary block per side), never all of
    them."""
    out = tmp_path / "zn"
    write_zipnum(_capture_df(spark, n=1000, hosts=5), str(out),
                 lines_per_block=20, n_shards=4)
    total_blocks = len((out / "cluster.idx").read_text().splitlines())
    assert 50 <= total_blocks <= 54  # 1000/20 + short shard tails
    blocks = zipnum_blocks_for_range(
        spark, str(out / "cluster.idx"),
        "example,host2)/", "example,host2)/￿").toPandas()
    # 200 host2 captures / 20 per block = 10 data blocks + a shard-tail
    # split + one boundary block per side — never the whole index
    assert len(blocks) <= 14, f"pruning failed: {len(blocks)} blocks"
    assert len(blocks) < total_blocks / 2
    # and the lookup over those blocks is still exact
    got = zipnum_lookup(spark, str(out), "example,host2)/")
    assert got.count() == 200


def test_zipnum_lookup_boundary_block_straddle(spark, tmp_path):
    """A prefix whose matches START inside a block whose first key is a
    DIFFERENT prefix must still find them (the lower-bound block)."""
    out = tmp_path / "zn"
    # 7 hosts x 30 captures with 20-line blocks => every host boundary
    # straddles a block somewhere
    write_zipnum(_capture_df(spark, n=210, hosts=7), str(out),
                 lines_per_block=20, n_shards=2)
    for h in range(7):
        got = zipnum_lookup(spark, str(out), f"example,host{h})/")
        assert got.count() == 30, f"host{h} lost rows at a boundary"


def test_cdxj_streaming_twin_matches_batch(spark, tmp_path):
    """read_cdxj_stream shares the batch parse pass: index shards
    dropped into a directory stream out as exactly the batch rows."""
    from wc_vector_indexing_spark.sources.cdx import read_cdxj_stream

    out = tmp_path / "zn"
    write_zipnum(_capture_df(spark, n=120, hosts=4), str(out),
                 lines_per_block=30, n_shards=2)
    q = (
        read_cdxj_stream(spark, str(out / "cdx-*.gz"))
        .writeStream.format("memory")
        .queryName("cdxj_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = spark.sql(
        "SELECT urlkey, ts14, warc_offset FROM cdxj_stream_out").collect()
    batch = read_cdxj(spark, str(out / "cdx-*.gz")).select(
        "urlkey", "ts14", "warc_offset").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(batch) == 120


def test_zipnum_merge_compacts_and_dedups(spark, tmp_path):
    """Daily-increment compaction: two pushes with an overlapping
    capture merge into one sorted cluster; the exact duplicate
    collapses, lookups see the union."""
    from wc_vector_indexing_spark.sources.cdx import zipnum_merge

    a = _capture_df(spark, n=60, hosts=3)
    # push B: 30 fresh captures + 10 exact replays of push A's rows
    b = _capture_df(spark, n=100, hosts=3).filter(
        "CAST(substr(ts14, 5) AS INT) >= 60 "
        "OR CAST(substr(ts14, 5) AS INT) < 10")
    write_zipnum(a, str(tmp_path / "push_a"),
                 lines_per_block=10, n_shards=2)
    write_zipnum(b, str(tmp_path / "push_b"),
                 lines_per_block=10, n_shards=2)
    zipnum_merge(spark, [str(tmp_path / "push_a"),
                         str(tmp_path / "push_b")],
                 str(tmp_path / "merged"),
                 lines_per_block=10, n_shards=2)
    merged = read_cdxj(spark, str(tmp_path / "merged" / "cdx-*.gz"))
    # 60 + 50 pushed, 10 exact duplicates collapse -> 100 distinct
    assert merged.count() == 100
    assert merged.select("urlkey").distinct().count() == 100
    # the merged cluster still serves pruned lookups
    got = zipnum_lookup(spark, str(tmp_path / "merged"),
                        "example,host1)/")
    ids = sorted(int(k[-4:]) for k in
                 (r["urlkey"] for r in got.collect()))
    assert ids == [i for i in range(100) if i % 3 == 1]
