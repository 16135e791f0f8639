"""fan_out contract: repairs under-partitioned inputs, never shrinks."""

from flink_ms_spark.partitioning import fan_out


def test_fan_out_expands_single_partition(spark):
    df = spark.range(100).coalesce(1)
    assert fan_out(df, target=8).rdd.getNumPartitions() == 8


def test_fan_out_noop_when_parallel_enough(spark):
    df = spark.range(100).repartition(16)
    out = fan_out(df, target=8)
    assert out is df  # no extra shuffle inserted


def test_fan_out_default_target_is_cluster_parallelism(spark):
    df = spark.range(10).coalesce(1)
    expect = spark.sparkContext.defaultParallelism
    assert fan_out(df).rdd.getNumPartitions() == expect
