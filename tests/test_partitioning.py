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
