"""Physical-layout contracts: fan_out repair, bucketed shuffle-free
joins, salted skew joins (result parity + plan shape)."""

from pyspark.sql import functions as F

from flink_ms_spark.partitioning import fan_out, salted_join, write_bucketed


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


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in the session's default warehouse dir
    # (spark.sql.warehouse.dir is static); dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = spark.range(1000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        dims = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        write_bucketed(facts, "b_facts", "k", num_buckets=8, sort_col="k")
        write_bucketed(dims, "b_dims", "k", num_buckets=8, sort_col="k")
        joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(7).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    salted = salted_join(big, small, "k", n_salt=4).groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from flink_ms_spark.partitioning import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/part-*")) == 64
    n = compact_parquet(spark, src, dst, target_bytes=10**12)
    assert n == 1
    assert len(glob.glob(dst + "/part-*")) == 1
    assert spark.read.parquet(dst).count() == 10_000
