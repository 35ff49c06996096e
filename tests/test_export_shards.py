"""Sharded corpus export (operators/export.py): record caps produce
multiple files, hive partitioning prunes, round-trips preserve rows."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.export import read_shards, write_shards


def _docs(spark, n=250):
    return spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 2}", text=f"doc {i} body") for i in range(n)]
    ).coalesce(1)


def test_max_records_rolls_files(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _docs(spark)
    write_shards(df, out, fmt="json", max_records_per_file=100)
    files = glob.glob(f"{out}/*.json")
    assert len(files) == 3  # ceil(250 / 100) from one writer task
    back = read_shards(spark, out, fmt="json", schema=df.schema)
    assert back.count() == 250
    assert sorted(r.doc_id for r in back.collect()) == list(range(250))


def test_partition_by_creates_prunable_dirs(spark, tmp_path):
    out = str(tmp_path / "by_source")
    df = _docs(spark)
    write_shards(df, out, fmt="parquet", partition_by=["source"])
    assert glob.glob(f"{out}/source=s0/*.parquet")
    assert glob.glob(f"{out}/source=s1/*.parquet")
    one = spark.read.parquet(out).filter("source = 's1'")
    assert one.count() == 125
    # partition pruning visible in the plan: only the s1 directory scans
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan


def test_csv_roundtrip_with_header(spark, tmp_path):
    out = str(tmp_path / "csv")
    df = _docs(spark, n=10).select("doc_id", "text")
    write_shards(df, out, fmt="csv", max_records_per_file=5, compression="gzip")
    files = glob.glob(f"{out}/*.csv.gz")
    assert len(files) == 2
    back = read_shards(spark, out, fmt="csv", schema=df.schema)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == sorted(
        (r.doc_id, r.text) for r in df.collect()
    )


def test_orc_roundtrip_with_partitioning(spark, tmp_path):
    out = str(tmp_path / "orc")
    df = _docs(spark)
    write_shards(df, out, fmt="orc", partition_by=["source"],
                 compression="zlib")
    assert glob.glob(f"{out}/source=s0/*.orc")
    back = read_shards(spark, out, fmt="orc")
    assert back.count() == 250
    assert sorted(r.doc_id for r in back.collect()) == list(range(250))
    # predicate pushdown reaches the ORC scan
    plan = (back.filter("doc_id = 7")._jdf.queryExecution()
            .executedPlan().toString())
    assert "PushedFilters: [" in plan and "doc_id" in plan


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        write_shards(_docs(spark, 5), str(tmp_path / "x"), fmt="avro")


def test_shard_manifest_counts_and_sizes(spark, tmp_path):
    from wc_vector_indexing_spark.operators.export import shard_manifest, write_shards

    df = spark.range(100).selectExpr("id AS doc_id", "concat('t', id) AS text")
    out = str(tmp_path / "shards")
    write_shards(df, out, fmt="json", max_records_per_file=30, coalesce_to=1)
    man = shard_manifest(spark, out, fmt="json").collect()
    assert sum(r.n_rows for r in man) == 100
    assert all(r.n_bytes > 0 for r in man)
    assert len(man) >= 4  # 100 rows / 30 per file
    assert all(r.file.endswith(".json") for r in man)


def test_corpus_diff_statuses(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.export import corpus_diff

    old = spark.createDataFrame(
        [Row(doc_id=1, text="a"), Row(doc_id=2, text="b"), Row(doc_id=3, text="c")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=2, text="b"), Row(doc_id=3, text="C2"), Row(doc_id=4, text="d")]
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_epoch_ordered_export(spark, tmp_path):
    """The --epoch-seed export path: hive-partitioned by shard, rows
    inside every shard file sorted by the deterministic order key —
    so a sequential reader replays the exact seeded training order."""
    import json as _json

    from wc_vector_indexing_spark.operators.sampling import epoch_order

    docs = _docs(spark)
    out = str(tmp_path / "epoch")
    order = epoch_order(docs, seed="s1", n_shards=4)
    ordered = (
        docs.join(order, "doc_id")
        .repartition(4, "shard")
        .sortWithinPartitions("shard", "order_key")
    )
    write_shards(ordered, out, fmt="json", partition_by=["shard"])
    files = glob.glob(f"{out}/shard=*/*.json")
    assert len(files) >= 4
    seen = 0
    for f in files:
        keys = [_json.loads(line)["order_key"] for line in open(f)]
        assert keys == sorted(keys), f
        seen += len(keys)
    assert seen == 250


def test_read_jsonl_corpus_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from wc_vector_indexing_spark.sources.readers import read_jsonl_corpus

    p = tmp_path / "feed.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "good row one"}',
                '{"doc_id": 2, "text": "good row two"}',
                '{"doc_id": 3, "text": "unterminated',   # broken JSON
                "not json at all",                        # garbage line
                '{"doc_id": 4, "text": "good row three"}',
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    good, quarantine = read_jsonl_corpus(spark, str(p), schema)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 4]
    assert good.columns == ["doc_id", "text"]
    bad = sorted(r[0] for r in quarantine.collect())
    assert bad == ["not json at all", '{"doc_id": 3, "text": "unterminated']


def test_shard_manifest_partitioned_output_keys_by_full_path(spark, tmp_path):
    """Regression (r5 advice): hive-partitioned output writes files with
    IDENTICAL basenames (part-00000-<uuid>) into every partition dir; a
    basename-keyed join merged their counts and fanned out. The manifest
    must key by the full relative path, one row per physical file, with
    per-file counts that sum to the corpus."""
    from wc_vector_indexing_spark.operators.export import shard_manifest, write_shards

    df = spark.range(120).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "CAST(id % 3 AS int) AS shard"
    ).coalesce(1)
    out = str(tmp_path / "part_shards")
    write_shards(df, out, fmt="json", partition_by=["shard"])
    man = shard_manifest(spark, out, fmt="json").collect()
    files = [r.file for r in man]
    assert len(files) == len(set(files))
    assert sum(r.n_rows for r in man) == 120  # no fan-out double count
    # one file per partition dir, each with exactly its partition's rows
    by_dir = {r.file.split("/")[0]: r.n_rows for r in man}
    assert by_dir == {"shard=0": 40, "shard=1": 40, "shard=2": 40}


def test_shard_manifest_zero_row_file_survives(spark, tmp_path):
    """An empty shard file (written by a task that got zero rows) must
    appear in the manifest with n_rows=0, not be dropped by the join."""
    import json as _json

    from wc_vector_indexing_spark.operators.export import shard_manifest

    out = tmp_path / "mixed"
    out.mkdir()
    (out / "part-00000.json").write_text(
        "\n".join(_json.dumps({"doc_id": i}) for i in range(7)) + "\n"
    )
    (out / "part-00001.json").write_text("")  # empty shard
    man = {r.file: (r.n_rows, r.n_bytes) for r in
           shard_manifest(spark, str(out), fmt="json").collect()}
    assert man["part-00000.json"][0] == 7
    assert man["part-00001.json"] == (0, 0)
