"""Physical table layout for cluster scale: bucketing and date
partitioning, as SCALE.md's data-layout table prescribes.

The sync ledger's hot path joins/aggregates on ``product_id`` every
tick (delta diff J3-J6, reference class-indexer.php:329-360 re-expressed
set-based). At 100 TB a shuffle of the ledger per tick dominates the
run; writing BOTH sides bucketed by the join key makes every such join
zero-shuffle — Spark reads co-located buckets and plans SortMergeJoin
with no Exchange.

Local/catalog notes: Spark's bucketing metadata lives in the session
catalog (``saveAsTable``); on a real deployment this is the
Hive/Glue/Unity metastore and the same code holds. The reader side
requires ``spark.sql.sources.bucketing.enabled`` (default true).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove a leftover warehouse directory for ``table`` when the
    metastore has no entry for it.

    A managed table's files live under ``spark.sql.warehouse.dir`` while
    its metadata lives in the metastore; when the two fall out of sync
    (scratch warehouse on a shared /tmp surviving a fresh in-memory
    Derby metastore), ``saveAsTable`` fails with LOCATION_ALREADY_EXISTS
    even in ``overwrite`` mode. Deleting the orphaned directory is safe
    precisely because the catalog does not know about it."""
    if spark.catalog.tableExists(table):
        return  # overwrite mode handles a registered table itself
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    parsed = urlparse(warehouse)
    if parsed.scheme not in ("", "file"):
        return  # remote warehouse: never delete blindly
    root = Path(parsed.path if parsed.scheme == "file" else warehouse)
    # managed-table dirs are lowercased; qualified names nest under db.db
    name = table.split(".")[-1].lower()
    loc = root / name
    if loc.exists():
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. Joins/aggregations between tables bucketed the same way
    on the same key plan with NO Exchange on either side; sorting within
    buckets additionally removes the join's Sort.

    Bucket count is a layout contract, not a tuning knob — both sides
    of a co-located join must agree on it (SCALE.md uses 4096 for the
    100 TB ledger; tests use small counts)."""
    keys = [key] if isinstance(key, str) else list(key)
    _clear_stale_location(df.sparkSession, table)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def write_date_partitioned(
    df: DataFrame,
    table: str,
    date_col: str,
    mode: str = "overwrite",
) -> None:
    """Write partitioned by a date-derived column so time-range scans
    (the modified-since watermark, log retention drops) become partition
    pruning + partition-drop instead of full scans."""
    _clear_stale_location(df.sparkSession, table)
    df.write.format("parquet").mode(mode).partitionBy(date_col).saveAsTable(table)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
):
    """Morton (Z-order) key column over ``cols``: each column is mapped
    to a ``2**bits``-bucket rank via corpus quantile boundaries, then
    the bucket bits are interleaved. Rows close in z-value are close in
    EVERY clustered dimension, so range-partitioning the write by this
    key gives files whose per-column min/max footers span a small slice
    of each domain — multi-column file skipping, where a plain sort
    only skips on its leading column (the Delta OSS OPTIMIZE ZORDER
    design, public).

    Quantile bucketing (not min/max scaling) keeps skewed columns from
    collapsing into a handful of buckets. Boundaries come from ONE
    `approxQuantile` pass (driver-held, ≤2**bits doubles per column);
    the bucket lookup is a pure codegen predicate-count over the
    literal boundary array — no shuffle, no UDF.

    Returns (key_column, boundaries) — boundaries returned so a writer
    can persist them and assign the same buckets to later appends."""
    from pyspark.sql import functions as F

    n = 2 ** bits
    probs = [i / n for i in range(1, n)]
    key = None
    bounds_by_col: dict[str, list[float]] = {}
    for j, c in enumerate(cols):
        bounds = sorted(set(df.stat.approxQuantile(c, probs, 0.001)))
        bounds_by_col[c] = bounds
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: F.col(c).cast("double") >= b))
        for i in range(bits):
            bit = F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j,
            )
            key = bit if key is None else key.bitwiseOR(bit)
    return key.cast("long"), bounds_by_col


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    target_files: int = 16,
) -> dict[str, list[float]]:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the interleaved key (contiguous z-ranges per
    file), sort within partitions, drop the key before writing. One
    extra range exchange — the price of the layout, paid once at write
    time; every later multi-column range scan skips files off the
    parquet min/max footers instead."""
    from pyspark.sql import functions as F

    key, bounds = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", key)
        .repartitionByRange(target_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables through the catalog (bucket info
    only attaches via ``spark.table``, not path reads)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
