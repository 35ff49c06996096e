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
    current partition count is below ``min_fraction`` of it.

    Streaming frames pass through untouched: micro-batch sizing is the
    scheduler's job there, and ``.rdd`` doesn't exist on a streaming
    plan — the short-circuit keeps frame-level operators (shingle_table,
    simhash64, text quality, …) usable in their stream twins.

    Reading the partition count runs no job but does force physical
    planning, which is seconds on deep cached/join lineages — so the
    count is memoized on the DataFrame instance for operators that call
    fan_out more than once on the same frame."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    n = getattr(df, "_wcvi_num_partitions", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        try:
            df._wcvi_num_partitions = n
        except AttributeError:  # slotted/frozen wrapper: skip the memo
            pass
    if n < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
