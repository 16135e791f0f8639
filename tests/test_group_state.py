"""Engine-managed keyed state (applyInPandasWithState): latest-wins
upsert parity with the reference's queryable ValueState, running-stats
state recovery across micro-batches and restarts."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from flink_ms_spark.streaming.group_state import (
    latest_per_key_changelog,
    running_stats_state,
)

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)
VAL_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _append(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b{len(list(path.iterdir()))}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _run(stream_df, fn, ckpt, sink_rows):
    out = fn(stream_df)

    def sink(batch_df, _bid):
        sink_rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_latest_per_key_state_survives_batches(spark, tmp_path):
    src = tmp_path / "kv_in"
    ckpt = tmp_path / "ckpt_kv"
    _append(src, [
        {"key": "u1", "payload": "a"},
        {"key": "u1", "payload": "b"},   # last-in-batch wins
        {"key": "u2", "payload": "x"},
    ])
    rows = []
    stream = spark.readStream.schema(KV_SCHEMA).json(str(src))
    _run(stream, latest_per_key_changelog, ckpt, rows)
    view = {r.key: r.payload for r in rows}
    assert view == {"u1": "b", "u2": "x"}

    # second batch touches only u1 — changelog emits only u1, and the
    # engine state (not our dict) carried u1's history
    _append(src, [{"key": "u1", "payload": "c"}])
    rows2 = []
    _run(stream, latest_per_key_changelog, ckpt, rows2)
    assert {r.key: r.payload for r in rows2} == {"u1": "c"}


def test_running_stats_state_accumulates_and_recovers(spark, tmp_path):
    src = tmp_path / "vals_in"
    ckpt = tmp_path / "ckpt_rs"
    _append(src, [
        {"key": "u1", "value": 1.0},
        {"key": "u1", "value": 3.0},
        {"key": "u2", "value": 10.0},
    ])
    rows = []
    stream = spark.readStream.schema(VAL_SCHEMA).json(str(src))
    _run(stream, running_stats_state, ckpt, rows)
    got = {r.key: (r.n, r.total, r.mean) for r in rows}
    assert got["u1"] == (2, 4.0, 2.0)
    assert got["u2"] == (1, 10.0, 10.0)

    # restart from the checkpoint: a fresh query object must recover
    # per-key (n, total) from the engine's state store, not from us
    _append(src, [{"key": "u1", "value": 5.0}])
    rows2 = []
    _run(stream, running_stats_state, ckpt, rows2)
    got2 = {r.key: (r.n, r.total, r.mean) for r in rows2}
    assert got2 == {"u1": (3, 9.0, 3.0)}
