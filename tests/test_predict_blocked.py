"""Blocked recommendForAllUsers (operators/predict.py:recommend_topn):
result parity with the broadcast form, and a cartesian-free plan when
both sides are block-partitioned."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ms_spark.operators.predict import recommend_topn
from flink_ms_spark.plans.synthetic import synthetic_als_model


def _sides(spark):
    model = synthetic_als_model(spark)
    users = model.where(F.col("kind") == "U").select(
        F.col("id").cast("int").alias("user_id"), "factors"
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").cast("int").alias("item_id"), "factors"
    )
    return users, items


def test_blocked_equals_broadcast_on_fixture(spark):
    users, items = _sides(spark)
    wide = recommend_topn(users, items, n=3, blocked=False)
    blk = recommend_topn(
        users, items, n=3, blocked=True, n_user_blocks=4, n_item_blocks=4
    )
    key = lambda r: (r.user_id, r.rk)  # noqa: E731
    a = sorted(((r.user_id, r.rk, r.item_id, r.prediction) for r in wide.collect()))
    b = sorted(((r.user_id, r.rk, r.item_id, r.prediction) for r in blk.collect()))
    assert a == b
    assert len(a) > 0


def test_blocked_plan_has_no_cartesian(spark):
    """With both sides above any broadcast threshold, the blocked plan
    must contain no CartesianProduct / BroadcastNestedLoopJoin — the
    user×item cross product exists only inside per-cell numpy matmuls."""
    users, items = _sides(spark)
    blk = recommend_topn(
        users, items, n=3, blocked=True, n_user_blocks=4, n_item_blocks=4
    )
    plan = blk._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan  # the block matmul cell op


def test_blocked_top1_and_larger_blocks(spark):
    """n=1 and uneven block counts still produce exactly one row per
    user with the argmax item."""
    users, items = _sides(spark)
    wide = recommend_topn(users, items, n=1, blocked=False)
    blk = recommend_topn(
        users, items, n=1, blocked=True, n_user_blocks=3, n_item_blocks=7
    )
    a = {(r.user_id): (r.item_id, r.prediction) for r in wide.collect()}
    b = {(r.user_id): (r.item_id, r.prediction) for r in blk.collect()}
    assert a == b
