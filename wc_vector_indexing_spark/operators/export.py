"""Sharded training-data export: size-bounded JSONL / CSV / parquet /
ORC shards, optionally hive-partitioned by a grouping column.

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

FORMATS = ("json", "csv", "parquet", "orc")


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


def shard_manifest(
    spark,
    path: str,
    fmt: str = "json",
) -> DataFrame:
    """(file, n_rows, n_bytes): per-shard manifest for a corpus written
    by `write_shards` — the reproducibility artifact a 100 TB pipeline
    ships next to the data (what was written, how many rows per file,
    which files exist). Row counts come from one distributed read
    grouped by `input_file_name()`; byte sizes from the driver-side
    listing (metadata only, no data read).

    Rows are keyed by the FULL file path, not the basename: with
    hive-partitioned output the same task writes identically-named
    part-00000-<uuid> files into every partition directory, so a
    basename key would merge counts across directories. The count
    frame is one row per file (manifest-sized, metadata not data), so
    it is collected and matched to the driver listing with proper URI
    decoding; files the reader yields no rows for (empty shards)
    still appear with n_rows=0."""
    import os
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")
    reader = {"json": spark.read.json, "csv": lambda p: spark.read.option("header", True).csv(p),
              "parquet": spark.read.parquet, "orc": spark.read.orc}[fmt]
    counts = (
        reader(path)
        .groupBy(F.input_file_name().alias("uri"))
        .agg(F.count("*").alias("n_rows"))
        .collect()  # one row per shard FILE — bounded by file count
    )
    root = os.path.realpath(path)
    by_rel: dict[str, int] = {}
    for r in counts:
        p = unquote(urlparse(r["uri"]).path)
        by_rel[os.path.relpath(os.path.realpath(p), root)] = r["n_rows"]
    rows = []
    for walk_root, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            full = os.path.join(walk_root, f)
            rel = os.path.relpath(full, root)
            rows.append((rel, by_rel.get(rel, 0), os.path.getsize(full)))
    return spark.createDataFrame(
        rows, "file string, n_rows long, n_bytes long"
    ).orderBy("file")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status): version diff between two corpus snapshots —
    status ∈ {added, removed, changed, unchanged} via a full outer join
    on the id with a content-hash compare. The audit step before
    promoting a new corpus version (how much churn did this crawl /
    filter change introduce?) and the input to incremental re-embedding
    (only `added`+`changed` need work — the same delta shape as the
    reference's chunk-level diff, class-delta-sync.php).

    One shuffle on the id; the hash is computed in the scan projection
    (sha2 codegen), so the join carries 64-byte digests, not documents."""
    from pyspark.sql import functions as F

    o = old.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("_h_old"))
    n = new.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("_h_new"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"))
