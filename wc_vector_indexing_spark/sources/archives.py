"""Archive sources — read tar/zip corpus dumps (the other common bulk
distribution format besides WARC/WET: academic corpora, Kaggle-style
dumps, media shards) into (archive, member, content) rows using stdlib
``tarfile``/``zipfile`` over Spark's ``binaryFile`` source.

Spark shape: ``binaryFile`` gives one row per archive with the bytes;
member extraction is an Arrow-batched flatMap — so parallelism is
per-ARCHIVE (matching the one-task-per-.gz model of the WET reader:
bulk corpora ship as many ~1 GB shards, which is plenty of tasks). The
whole archive rides through executor memory once; member rows carry
only their own bytes. For single multi-TB archives, re-shard first —
documented, same trade as concatenated-gzip WET.

Composes with ``bmp_gif.sniff_format`` + the media decoders and the
text operators: a tar of mixed media/text becomes a typed media/
documents table in one pass."""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ARCHIVE_SCHEMA = "archive string, member string, size long, content binary"


def _tar_members(name: str, blob: bytes, pattern: str | None):
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            if pattern and pattern not in m.name:
                continue
            f = tf.extractfile(m)
            if f is None:
                continue
            yield name, m.name, m.size, f.read()


def _zip_members(name: str, blob: bytes, pattern: str | None):
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if pattern and pattern not in info.filename:
                continue
            yield name, info.filename, info.file_size, zf.read(info)


def read_archive_members(
    spark: SparkSession,
    path: str,
    member_pattern: str | None = None,
) -> DataFrame:
    """(archive, member, size, content) rows from tar (optionally
    .tar.gz/.tgz — tarfile sniffs compression) and zip files matched by
    ``path`` (file/dir/glob). ``member_pattern`` filters member names
    by substring BEFORE bytes are materialized into rows."""
    raw = spark.read.format("binaryFile").load(path)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                lower = fname.lower()
                if lower.endswith(".zip"):
                    it = _zip_members(fname, blob, member_pattern)
                elif lower.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2")):
                    it = _tar_members(fname, blob, member_pattern)
                else:  # sniff: zip magic, else try tar
                    if blob[:4] == b"PK\x03\x04":
                        it = _zip_members(fname, blob, member_pattern)
                    else:
                        it = _tar_members(fname, blob, member_pattern)
                for archive, member, size, content in it:
                    rows.append(
                        {"archive": archive, "member": member,
                         "size": size, "content": content}
                    )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "size", "content"]
            )

    return raw.select("path", "content").mapInPandas(explode, schema=ARCHIVE_SCHEMA)


# ------------------------------------------------------------- WebDataset

def webdataset_samples(members: DataFrame) -> DataFrame:
    """Group archive member rows into WebDataset-style SAMPLES.

    The WebDataset convention (public webdataset format spec: tar
    shards of ``{key}.{ext}`` members, e.g. ``n0123.jpg`` +
    ``n0123.cls`` + ``n0123.json``) names each part of one training
    sample with a shared basename key; the part type is everything
    after the FIRST dot of the basename (so ``x.seg.png`` is part
    ``seg.png`` of sample ``x``, per the spec's multi-extension rule).

    Pure Catalyst — one groupBy on (archive, key): parts become a
    sorted ``map<string,binary>``, so downstream decode UDFs address
    parts by type. Parallelism follows the tar shards (the whole point
    of the format at 100 TB: sequential-read shards, no per-sample
    object-store round trips); the groupBy shuffles only member
    bytes that were already in flight, and samples are tar-local so
    AQE coalesces the exchange cheaply.

    Returns (archive, key, parts map<string,binary>, n_parts,
    total_bytes)."""
    from pyspark.sql import functions as F

    base = F.element_at(F.split(F.col("member"), "/"), -1)
    key = F.substring_index(base, ".", 1)
    ext = F.expr(
        "substring(element_at(split(member, '/'), -1),"
        " length(substring_index(element_at(split(member, '/'), -1), '.', 1)) + 2)"
    )
    parts = members.select(
        "archive",
        key.alias("key"),
        ext.alias("ext"),
        "size",
        "content",
    ).where(F.col("ext") != "")  # extension-less members aren't parts
    # a malformed tar can repeat a member name; map_from_entries would
    # fail the whole STAGE on the duplicate key (mapKeyDedupPolicy=
    # EXCEPTION), so dedupe per part type first — deterministically,
    # keeping the largest (then bytewise-greatest) body, the closest
    # order-free analogue of tar's last-member-wins
    parts = parts.groupBy("archive", "key", "ext").agg(
        F.max(F.struct("size", "content")).alias("best")
    ).select(
        "archive", "key", "ext",
        F.col("best.size").alias("size"),
        F.col("best.content").alias("content"),
    )
    return (
        parts.groupBy("archive", "key")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "content")))
            ).alias("parts"),
            F.count("*").alias("n_parts"),
            F.sum("size").alias("total_bytes"),
        )
    )


def write_webdataset(df: DataFrame, path: str) -> DataFrame:
    """Write (key string, parts map<string,binary>) rows as WebDataset
    tar shards — one ``shard-*.tar`` per partition, members named
    ``{key}.{part}`` with the parts of one sample CONTIGUOUS in the
    stream (the property sequential-read training loaders rely on;
    parts are emitted in sorted-type order within a sample). The
    egress half of :func:`webdataset_samples`: each task streams its
    own tar, no driver funnel, so shard count = partition count and a
    repartition upstream sizes shards. Returns the (shard, n_samples,
    n_bytes) manifest as an eagerly-materialized DataFrame."""
    import os
    import tarfile
    from typing import Iterator as _Iter

    import pandas as _pd

    os.makedirs(path, exist_ok=True)

    def dump(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = os.path.join(path, f"shard-{pid:05d}.tar")
        n = 0
        with tarfile.open(shard, "w") as tf:
            for pdf in batches:
                for key, parts in zip(pdf["key"], pdf["parts"]):
                    for ext in sorted(parts):
                        body = bytes(parts[ext])
                        info = tarfile.TarInfo(f"{key}.{ext}")
                        info.size = len(body)
                        tf.addfile(info, io.BytesIO(body))
                    n += 1
        if n == 0:
            os.remove(shard)
            yield _pd.DataFrame({"shard": [], "n_samples": [], "n_bytes": []})
        else:
            yield _pd.DataFrame(
                {"shard": [shard], "n_samples": [n],
                 "n_bytes": [os.path.getsize(shard)]}
            )

    from wc_vector_indexing_spark.sources.readers import eager_manifest

    return eager_manifest(df.select("key", "parts"), dump,
                          schema="shard string, n_samples long, n_bytes long")
