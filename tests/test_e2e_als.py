"""End-to-end slice (SURVEY.md §7 step 2): fixture ratings → ALS train →
model table → batch predict → MSE. ML tier: quality thresholds, not
factor equality (FlinkML vs MLlib numeric parity is not expected)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ms_spark.ml.als import als_model_table, train_als
from flink_ms_spark.operators.evaluate import mse
from flink_ms_spark.operators.sgd import sgd_step
from flink_ms_spark.functions.vector import elementwise_mean
from flink_ms_spark.serving.store import ModelStore
from flink_ms_spark.functions.codecs import model_key
from flink_ms_spark.sources.ratings import ratings_from_events


@pytest.fixture(scope="module")
def model_and_ratings(spark, sf_smoke):
    ratings = ratings_from_events(spark, sf_smoke).cache()
    # reference defaults (ALSImpl.scala:36-49) except regParam: λ=0.9 is
    # far too strong for this synthetic signal; reference CLI allows any λ.
    model = train_als(ratings, rank=10, max_iter=10, reg_param=0.1, seed=42)
    table = als_model_table(model).cache()
    return table, ratings


def test_model_table_shape(spark, model_and_ratings):
    table, ratings = model_and_ratings
    kinds = {r.kind for r in table.select("kind").distinct().collect()}
    assert kinds == {"U", "I"}
    k = table.select(F.size("factors").alias("k")).distinct().collect()
    assert [r.k for r in k] == [10]


def test_mse_below_global_mean_baseline(spark, model_and_ratings):
    table, ratings = model_and_ratings
    row = mse(ratings, table).collect()[0]
    # baseline: predicting the global mean rating for every pair
    mean = ratings.agg(F.avg("rating").alias("m")).collect()[0].m
    base = ratings.agg(F.avg(F.pow(F.col("rating") - F.lit(mean), 2)).alias("v")).collect()[0].v
    assert row.n > 0
    assert row.mse < base, f"trained MSE {row.mse} not better than mean-baseline {base}"


def test_sgd_step_reduces_batch_error(spark, model_and_ratings):
    table, ratings = model_and_ratings
    batch = ratings.limit(200).cache()
    before = mse(batch, table).collect()[0].mse
    mean_u = elementwise_mean(table.where(F.col("kind") == "U"))
    mean_i = elementwise_mean(table.where(F.col("kind") == "I"))
    updates = sgd_step(batch, table, mean_u, mean_i, learning_rate=0.05)
    # merge updates into the model (last-write-wins by key)
    merged = (
        table.join(updates.select("id", "kind").withColumn("_upd", F.lit(1)), ["id", "kind"], "left_anti")
        .unionAll(updates)
    )
    after = mse(batch, merged).collect()[0].mse
    assert after < before, f"SGD step did not reduce error: {before} -> {after}"


def test_serving_store_roundtrip(spark, model_and_ratings):
    table, _ = model_and_ratings
    store = ModelStore(spark, "ALS_MODEL")
    kv = table.select(model_key("id", "kind").alias("key"), "id", "kind", "factors")
    store.upsert_batch(kv)
    some = table.limit(1).collect()[0]
    hit = store.lookup(f"{some.id}-{some.kind}")
    assert hit is not None and list(hit.factors) == list(some.factors)
    assert store.lookup("999999-U") is None  # Optional.empty parity
    # upsert newer value for same key wins
    upd = spark.createDataFrame(
        [(f"{some.id}-{some.kind}", some.id, some.kind, [0.0] * 10)],
        "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    store.upsert_batch(upd)
    assert list(store.lookup(f"{some.id}-{some.kind}").factors) == [0.0] * 10
