"""Partition-shape helpers.

``fan_out`` exists for one reason: an operator whose per-row cost is
10-100× the scan cost (Arrow-batched python stages, wide explodes) is
bottlenecked by the INPUT's partition count, and a small parquet file
arrives as one partition. Round-robin repartitioning to the session's
parallelism before such a stage costs one shuffle of the input bytes —
trivially amortized by the stage it unblocks. At real scale (100 TB
scans yield thousands of partitions) the guard makes it a no-op, so the
helper never adds a shuffle to a plan that is already parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current partition count is below ``min_fraction`` of it. Cheap to
    call: reading the partition count plans the RDD but runs no job."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
