"""Vector math + prediction operator semantics (SURVEY.md M3-M9)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_ms_spark.functions.vector import cosine, dot, elementwise_mean, has_nan
from flink_ms_spark.operators.evaluate import mse
from flink_ms_spark.operators.predict import predict_als_batch, predict_svm_batch
from flink_ms_spark.operators.sgd import sgd_step


def _model(spark):
    return spark.createDataFrame(
        [
            ("1", "U", [1.0, 2.0]),
            ("2", "U", [0.5, -1.0]),
            ("10", "I", [3.0, 1.0]),
            ("11", "I", [-2.0, 0.5]),
        ],
        ["id", "kind", "factors"],
    )


def test_dot_product(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"])
    assert df.select(dot("a", "b").alias("d")).collect()[0].d == 32.0


def test_cosine(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"])
    got = [r[0] for r in df.select(cosine("a", "b")).collect()]
    assert got == [1.0, 0.0]


def test_predict_als_batch_inner_join_drops_missing(spark):
    queries = spark.createDataFrame([(1, 10), (1, 11), (2, 10), (99, 10)], ["user_id", "item_id"])
    got = {
        (r.user_id, r.item_id): r.prediction
        for r in predict_als_batch(queries, _model(spark)).collect()
    }
    # 99 missing from model → dropped (reference Optional.empty behavior)
    assert set(got) == {(1, 10), (1, 11), (2, 10)}
    assert got[(1, 10)] == 1 * 3 + 2 * 1
    assert got[(1, 11)] == 1 * -2 + 2 * 0.5
    assert got[(2, 10)] == 0.5 * 3 + -1 * 1


def test_predict_svm_semantics(spark):
    model = spark.createDataFrame([(1, 0.5), (2, -1.0), (3, 2.0)], ["feature_id", "weight"])
    # q1: 0.5*2 + (-1)*1 = 0 → NOT > 0 → -1.0 (strict >, reference SVMPredict.java:85-89)
    # q2: feature 99 missing → contributes 0; 2.0*1 = 2 → +1.0
    qf = spark.createDataFrame(
        [(1, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0), (2, 99, 5.0)],
        ["query_id", "feature_id", "value"],
    )
    got = {r.query_id: (r.raw_prediction, r.prediction) for r in predict_svm_batch(qf, model).collect()}
    assert got[1] == (0.0, -1.0)
    assert got[2] == (2.0, 1.0)
    raw = {r.query_id: r.prediction for r in predict_svm_batch(qf, model, output_decision_function=True).collect()}
    assert raw[1] == 0.0 and raw[2] == 2.0


def test_mse_skip_semantics(spark):
    ratings = spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, 0.0), (99, 10, 3.0)], ["user_id", "item_id", "rating"]
    )
    row = mse(ratings, _model(spark)).collect()[0]
    # (1,10): pred 5 → err 0; (2,11): pred -1.5 → err 2.25; (99,·) skipped
    assert row.n == 2
    assert math.isclose(row.mse, (0.0 + 2.25) / 2)


def test_elementwise_mean(spark):
    df = spark.createDataFrame([([1.0, 10.0],), ([3.0, 20.0],)], ["factors"])
    row = elementwise_mean(df).collect()[0]
    assert row.factors == [2.0, 15.0]


def test_has_nan(spark):
    df = spark.createDataFrame([([1.0, float("nan")],), ([1.0, 2.0],)], ["factors"])
    got = [r[0] for r in df.select(has_nan("factors")).collect()]
    assert got == [True, False]


def test_sgd_step_simultaneous_update(spark):
    model = _model(spark)
    ratings = spark.createDataFrame([(1, 10, 6.0)], ["user_id", "item_id", "rating"])
    out = {(r.id, r.kind): r.factors for r in sgd_step(ratings, model, learning_rate=0.1).collect()}
    # e = 6 - (1*3 + 2*1) = 1; u' = u + 0.1*(e*i) = [1+0.3, 2+0.1]
    # i' = i + 0.1*(e*u) with PRE-update u = [3+0.1, 1+0.2]
    assert out[("1", "U")] == [1.3, 2.1]
    assert out[("10", "I")] == [3.1, 1.2]


def test_sgd_cold_start_mean_fallback(spark):
    model = _model(spark)
    user_mean = spark.createDataFrame([([1.0, 1.0],)], ["factors"])
    item_mean = spark.createDataFrame([([2.0, 2.0],)], ["factors"])
    ratings = spark.createDataFrame([(99, 10, 5.0)], ["user_id", "item_id", "rating"])
    out = {
        (r.id, r.kind): r.factors
        for r in sgd_step(ratings, model, user_mean, item_mean, learning_rate=0.1).collect()
    }
    # user 99 missing → mean [1,1]; e = 5 - (1*3+1*1) = 1
    assert out[("99", "U")] == [1.0 + 0.1 * 3.0, 1.0 + 0.1 * 1.0]
    assert out[("10", "I")] == [3.0 + 0.1 * 1.0, 1.0 + 0.1 * 1.0]

    # without means, the missing-user row is dropped entirely
    out2 = sgd_step(ratings, model).collect()
    assert out2 == []


def test_sgd_last_write_wins(spark):
    model = _model(spark)
    ratings = spark.createDataFrame(
        [(1, 10, 6.0), (1, 11, 0.0)], ["user_id", "item_id", "rating"]
    ).coalesce(1)
    out = {(r.id, r.kind): r.factors for r in sgd_step(ratings, model).collect()}
    # Both ratings update user 1; last input (1,11) wins for the U row.
    # Both reads see the same snapshot u=[1,2]: e2 = 0 - (1*-2 + 2*0.5) = 1
    assert out[("1", "U")] == [1.0 + 0.1 * -2.0, 2.0 + 0.1 * 0.5]
    assert len(out) == 3  # U:1, I:10, I:11
