"""fan_out guard semantics: parallelize under-partitioned inputs, stay
out of the way of already-parallel plans (the at-scale branch)."""

from wc_vector_indexing_spark.functions.partitioning import fan_out


def test_fan_out_noop_when_already_parallel(spark):
    df = spark.range(0, 1000, 1, numPartitions=32)
    assert fan_out(df) is df  # no Exchange added to a parallel plan


def test_fan_out_spreads_single_partition(spark):
    one = spark.range(0, 1000, 1, numPartitions=1)
    out = fan_out(one)
    assert out is not one
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fan_out_passes_streaming_frames_through(spark):
    """Streaming plans have no .rdd; fan_out must be an identity there so
    frame-level operators keep their stream twins working."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert stream.isStreaming
    assert fan_out(stream) is stream


def test_fan_out_memoizes_partition_count(spark):
    """Repeated fan_out on the same frame must not re-plan: the count is
    cached on the instance after the first call."""
    df = spark.range(0, 100, 1, numPartitions=32)
    assert fan_out(df) is df
    assert getattr(df, "_wcvi_num_partitions", None) == 32
    # poison the memo: a re-plan would overwrite it, reuse won't
    df._wcvi_num_partitions = 32_000
    assert fan_out(df) is df
