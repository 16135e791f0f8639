"""Approximate-aggregate accuracy: the sketches a 100 TB pipeline uses
instead of exact distinct/percentile (HLL++, GK quantiles) stay within
their error bounds on the fixture data. Not oracle queries — DuckDB's
sketches differ bit-wise by design; accuracy is the contract."""

from pyspark.sql import functions as F

from flink_ms_spark.sources.tables import load_table


def test_approx_count_distinct_within_rsd(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_close_to_exact(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01
