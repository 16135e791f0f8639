"""Streaming tier (SURVEY.md §5): file-source → serving store pipeline,
last-write-wins upsert, point-lookup hit/miss, online SGD stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_ms_spark.serving.store import ModelStore
from flink_ms_spark.streaming.loader import run_online_sgd_stream, stream_model_into_store


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_stream_model_into_store_last_write_wins(spark, tmp_path):
    src = tmp_path / "model_in"
    ckpt = tmp_path / "ckpt1"
    src.mkdir()
    _write(str(src / "a.txt"), ["1,U,1.0;2.0", "2,U,3.0;4.0", "1,U,9.0;9.0"])
    store = ModelStore(spark, "ALS_MODEL")
    q = stream_model_into_store(spark, str(src), store, str(ckpt), available_now=True)
    q.awaitTermination(120)
    # two versions of key 1-U in one batch → the later line wins
    assert len(store) == 2
    assert list(store.lookup("1-U").factors) == [9.0, 9.0]
    assert list(store.lookup("2-U").factors) == [3.0, 4.0]
    assert store.lookup("3-U") is None  # Optional.empty parity (X2)

    # second file arrives → incremental batch updates key 2-U
    _write(str(src / "b.txt"), ["2,U,7.0;7.0"])
    q2 = stream_model_into_store(spark, str(src), store, str(ckpt), available_now=True)
    q2.awaitTermination(120)
    assert list(store.lookup("2-U").factors) == [7.0, 7.0]
    assert list(store.lookup("1-U").factors) == [9.0, 9.0]  # untouched


def test_online_sgd_stream_updates_model(spark, tmp_path):
    model_src = tmp_path / "model_src"
    ratings_src = tmp_path / "ratings_src"
    model_src.mkdir()
    ratings_src.mkdir()
    # model: user 1, item 10, and MEAN fallbacks
    _write(
        str(model_src / "m.txt"),
        ["1,U,1.0;2.0", "10,I,3.0;1.0", "MEAN,U,1.0;1.0", "MEAN,I,2.0;2.0"],
    )
    store = ModelStore(spark, "ALS_MODEL")
    stream_model_into_store(
        spark, str(model_src), store, str(tmp_path / "ckpt_m"), available_now=True
    ).awaitTermination(120)

    _write(str(ratings_src / "r.txt"), ["1\t10\t6.0", "99\t10\t5.0"])
    run_online_sgd_stream(
        spark, str(ratings_src), store, str(tmp_path / "ckpt_r"), learning_rate=0.1
    ).awaitTermination(180)

    # same arithmetic as test_sgd_step_simultaneous_update: e=1 for (1,10)
    u = list(store.lookup("1-U").factors)
    assert u == [1.3, 2.1]
    # cold-start user 99 was created from MEAN-U
    assert store.lookup("99-U") is not None
    # MEAN rows must never be overwritten by the SGD loop
    assert list(store.lookup("MEAN-U").factors) == [1.0, 1.0]
