"""Sharded training-data export: size-bounded JSONL / CSV / parquet
shards, optionally hive-partitioned by a grouping column.

The output side of the curation pipeline: after dedup + quality gating +
packing, training jobs want the corpus as N similarly-sized shard files
(per source/split), not one giant file and not a million tiny ones.

Scale mechanics:
  * ``maxRecordsPerFile`` bounds shard size WITHOUT a repartition —
    each task rolls to a new file as it passes the cap, so no extra
    shuffle is introduced on a 100 TB write.
  * ``partition_by`` produces hive-style ``col=value/`` directories —
    downstream readers partition-prune on them (mixture sampling by
    source, split selection without reading the other splits).
  * ``coalesce_to`` (optional) caps the file COUNT for small curated
    outputs — a narrow coalesce, not a shuffle. Don't set it for large
    writes: it also caps write parallelism.

Reference parity: generalizes the reference's one-shot CSV export
(class-admin-page-logs.php:176-200 — mirrored by logs.export_csv) to
the corpus-scale formats a training pipeline consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FORMATS = ("json", "csv", "parquet")


def write_shards(
    df: DataFrame,
    path: str,
    fmt: str = "json",
    max_records_per_file: int = 100_000,
    partition_by: list[str] | None = None,
    coalesce_to: int | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as size-bounded shards. ``fmt='json'`` emits JSONL
    (one JSON object per line — the common pre-training corpus format)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    if coalesce_to is not None:
        df = df.coalesce(coalesce_to)
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def read_shards(spark, path: str, fmt: str = "json", schema=None) -> DataFrame:
    """Round-trip reader for exported shards. For json/csv, pass the
    original ``df.schema`` to skip inference (a second full scan) and to
    keep types exact; hive partition columns come back automatically."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.format(fmt).load(path)
