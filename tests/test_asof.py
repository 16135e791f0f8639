"""Unit tests for the union+window as-of join (operators/asof.py)."""

from __future__ import annotations

from flink_ms_spark.operators.asof import asof_join_backward


def test_backward_match_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 5, "b"), ("u2", 7, "c")],
        ["k", "t", "lid"],
    )
    right = spark.createDataFrame(
        [("u1", 4, 100), ("u1", 9, 101), ("u1", 12, 102), ("u3", 1, 103)],
        ["k", "t", "rid"],
    )
    out = {
        (r.k, r.lid): r.rid_asof
        for r in asof_join_backward(
            left, right, on="k", ts_col="t", right_value_cols=["rid"]
        ).collect()
    }
    # u1@10 → rid 101 (t=9); u1@5 → rid 100 (t=4); u2 has no right rows
    assert out == {("u1", "a"): 101, ("u1", "b"): 100, ("u2", "c"): None}


def test_equal_ts_is_inclusive_and_tiebreak_max(spark):
    left = spark.createDataFrame([("u1", 5, "x")], ["k", "t", "lid"])
    right = spark.createDataFrame(
        [("u1", 5, 7), ("u1", 5, 9), ("u1", 6, 11)], ["k", "t", "rid"]
    )
    [row] = asof_join_backward(
        left, right, on="k", ts_col="t", right_value_cols=["rid"]
    ).collect()
    # same-instant rows match (<=), greatest tie-break wins, later rows don't
    assert row.rid_asof == 9
