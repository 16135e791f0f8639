"""The SPARK_GRAFT_RELIABLE_CHECKPOINT flag switches the iterative
tier's materialization from executor-local checkpoint blocks (fast,
not fault tolerant) to reliable checkpoint files (survive executor
loss) — VERDICT r14 item 6."""

import os

from flink_ms_spark.partitioning import materialize


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    df = materialize(spark.range(10))
    assert df.count() == 10
    # localCheckpoint truncates the plan to an in-memory RDD scan
    assert "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_reliable_flag_uses_checkpoint_files(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = materialize(spark.range(10))
    assert df.count() == 10
    # reliable checkpoint writes RDD files under the checkpoint dir
    ckpt_root = tmp_path / "ckpt"
    found = [p for p in ckpt_root.rglob("*") if p.is_file()]
    assert found, "reliable checkpoint produced no files"


def test_iterative_tier_runs_under_reliable_flag(spark, monkeypatch, tmp_path, sf_smoke):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    from flink_ms_spark.operators.graph import cooccurrence_edges, triangle_count

    li = spark.read.parquet(os.path.join(sf_smoke, "lineitem.parquet"))
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    row = triangle_count(edges).collect()[0]
    assert row.n_edges > 0
