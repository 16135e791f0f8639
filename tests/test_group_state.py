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


def _run(stream_df, fn, ckpt, sink_rows, mode="update"):
    out = fn(stream_df)
    n_batches = [0]

    def sink(batch_df, _bid):
        sink_rows.extend(batch_df.collect())
        n_batches[0] += 1

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    # a query holding registered processing-time timers does not
    # self-terminate under availableNow — poll until the data batch
    # AND a trailing (possibly timer-only) batch have both run, then
    # stop explicitly. Counting sink invocations avoids the race of
    # reading lastProgress before the data batch executes.
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        if not q.isActive or n_batches[0] >= 2:
            break
        _time.sleep(0.5)
    if q.isActive:
        q.stop()
        q.awaitTermination(30)


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


def test_session_close_state_emits_closed_sessions(spark, tmp_path):
    from flink_ms_spark.streaming.group_state import session_close_state

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts_sec", T.DoubleType()),
        ]
    )
    src = tmp_path / "sess_in"
    # u1: two bursts separated by > gap → first session closes when the
    # second burst arrives; u2: one burst (stays open, not emitted)
    _append(src, [
        {"key": "u1", "ts_sec": 0.0},
        {"key": "u1", "ts_sec": 100.0},
        {"key": "u1", "ts_sec": 5000.0},
        {"key": "u2", "ts_sec": 10.0},
    ])
    rows = []
    stream = spark.readStream.schema(schema).json(str(src))
    _run(stream, lambda s: session_close_state(s, gap_seconds=1800.0),
         tmp_path / "ckpt_sess", rows, mode="append")
    got = [(r.key, r.session_start, r.session_end, r.n_events) for r in rows]
    assert got == [("u1", 0.0, 100.0, 2)]

    # next batch: another > gap jump for u1 closes the 5000.0 session
    _append(src, [{"key": "u1", "ts_sec": 9000.0}])
    rows2 = []
    _run(stream, lambda s: session_close_state(s, gap_seconds=1800.0),
         tmp_path / "ckpt_sess", rows2, mode="append")
    got2 = [(r.key, r.session_start, r.session_end, r.n_events) for r in rows2]
    assert got2 == [("u1", 5000.0, 5000.0, 1)]


def test_dynamic_rules_take_effect_between_batches(spark, tmp_path):
    import json as _json

    from flink_ms_spark.streaming.rules import DynamicRuleFilter

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = tmp_path / "docs_in"
    rules_path = tmp_path / "rules.json"
    rules_path.write_text(_json.dumps({"banned_sources": ["spam"]}))

    _append(src, [
        {"doc_id": 1, "text": "good doc with plenty of words here", "source": "ok"},
        {"doc_id": 2, "text": "junk", "source": "spam"},
    ])
    out = tmp_path / "survivors"
    f = DynamicRuleFilter(str(rules_path), out_dir=str(out))
    stream = spark.readStream.schema(schema).json(str(src))
    q = f.run(stream, str(tmp_path / "ckpt_r"))
    q.awaitTermination(120)
    # default usage is the distributed sink, not a driver list
    assert f.kept == []
    assert [r.doc_id for r in spark.read.parquet(str(out)).collect()] == [1]

    # hot-update the rules: now also require ≥ 5 tokens
    rules_path.write_text(
        _json.dumps({"banned_sources": ["spam"], "min_tokens": 5})
    )
    _append(src, [
        {"doc_id": 3, "text": "too short", "source": "ok"},
        {"doc_id": 4, "text": "this one has at least five tokens", "source": "ok"},
    ])
    q = f.run(stream, str(tmp_path / "ckpt_r"))
    q.awaitTermination(120)
    assert f.applied_rules[-1]["min_tokens"] == 5  # new rules, no restart
    surv = spark.read.parquet(str(out))
    assert sorted(r.doc_id for r in surv.collect()) == [1, 4]
    assert (out / "batch_id=1").exists()

    # opt-in debug mode still collects for inspection
    _append(src, [
        {"doc_id": 5, "text": "another doc with at least five tokens", "source": "ok"},
    ])
    dbg = DynamicRuleFilter(str(rules_path), out_dir=str(out), debug_keep=True)
    q = dbg.run(stream, str(tmp_path / "ckpt_r"))
    q.awaitTermination(120)
    assert [r.doc_id for r in dbg.kept] == [5]


def test_changelog_and_stats_honor_nondefault_column_names(spark, tmp_path):
    """The public key_col/payload_col/value_col parameters must work
    with non-default names (they are canonicalized before the stateful
    fn runs — a regression here crashes on the executor)."""
    import json

    from flink_ms_spark.streaming.group_state import (
        latest_per_key_changelog,
        running_stats_state,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"k": "u1", "model_line": "old", "seq": 1, "rating": 2.0},
        {"k": "u1", "model_line": "new", "seq": 2, "rating": 4.0},
        {"k": "u2", "model_line": "only", "seq": 1, "rating": 1.0},
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "k STRING, model_line STRING, seq LONG, rating DOUBLE"

    got = {}

    def sink(df, _bid):
        for r in df.collect():
            got[r.key] = r.payload

    stream = spark.readStream.schema(schema).json(str(src))
    (
        latest_per_key_changelog(
            stream, key_col="k", payload_col="model_line", ord_col="seq"
        )
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert got == {"u1": "new", "u2": "only"}  # ord-deterministic winner

    stats = {}

    def sink2(df, _bid):
        for r in df.collect():
            stats[r.key] = (r.n, r.total)

    stream2 = spark.readStream.schema(schema).json(str(src))
    (
        running_stats_state(stream2, key_col="k", value_col="rating")
        .writeStream.outputMode("update")
        .foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert stats == {"u1": (2, 6.0), "u2": (1, 1.0)}
