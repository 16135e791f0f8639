"""salted_join: match-for-match equality with the plain join, salt
spread, and the guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ms_spark.operators.skewjoin import salted_join
from flink_ms_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _sides(spark):
    events = load_table(spark, SF, "events")
    fact = events.select("event_id", "user_id", "value")
    dim = fact.groupBy("user_id").agg(F.count("*").alias("n_user_events"))
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _sides(spark)
    salted = salted_join(
        fact, dim, "user_id", n_salts=4, salt_expr=F.xxhash64("event_id")
    )
    plain = fact.join(dim, "user_id")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_keeps_unmatched_fact_rows(spark):
    fact, dim = _sides(spark)
    # drop one user from the dim: left join must keep its fact rows
    some_user = dim.select("user_id").orderBy("user_id").first().user_id
    dim_missing = dim.filter(F.col("user_id") != some_user)
    out = salted_join(
        fact, dim_missing, "user_id", n_salts=4,
        salt_expr=F.xxhash64("event_id"), how="left",
    )
    kept = out.filter(F.col("user_id") == some_user)
    assert kept.count() == fact.filter(F.col("user_id") == some_user).count()
    assert kept.where(F.col("n_user_events").isNotNull()).count() == 0


def test_salt_actually_spreads_a_hot_key(spark):
    fact, dim = _sides(spark)
    hot = (
        fact.groupBy("user_id").count().orderBy(F.desc("count")).first().user_id
    )
    n = 8
    salts = (
        fact.filter(F.col("user_id") == hot)
        .select(
            F.pmod(F.xxhash64("event_id"), F.lit(n)).cast("int").alias("s")
        )
        .distinct()
        .count()
    )
    assert salts == n, "hot key's rows must span every salt partition"


def test_unsupported_how_rejected(spark):
    fact, dim = _sides(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "user_id", how="full")


def test_preexisting_salt_column_rejected(spark):
    """A caller's _salt column must not be silently clobbered and then
    dropped from the result (ADVICE r10) — refuse loudly instead."""
    fact, dim = _sides(spark)
    with pytest.raises(ValueError, match="_salt"):
        salted_join(fact.withColumn("_salt", F.lit(1)), dim, "user_id")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(fact, dim.withColumn("_salt", F.lit(1)), "user_id")

    from flink_ms_spark.partitioning import salted_join as psalted

    with pytest.raises(ValueError, match="_salt"):
        psalted(fact.withColumn("_salt", F.lit(1)), dim, "user_id")
