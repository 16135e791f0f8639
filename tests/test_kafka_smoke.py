"""Env-gated REAL-Kafka smoke (VERDICT r10 #6): the S7→T2→P1→K4 chain
plus the K2 write-back over an actual broker.

Skipped unless ``KAFKA_BOOTSTRAP`` is set (no broker ships in this
container — the codec layer is executed on recorded frames in
tests/test_streaming.py instead). On a broker-equipped host:

    KAFKA_BOOTSTRAP=localhost:9092 \
    PYSPARK_SUBMIT_ARGS="--packages \
      org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver> \
      pyspark-shell" \
    python -m pytest tests/test_kafka_smoke.py -q

The test is transport-parity by construction: it drives EXACTLY the
same builder calls as the file-bus end-to-end test
(test_bus_produce_consume_parse_upsert_end_to_end), only with a
``kafka://`` URI — so a pass here verifies nothing but the wiring the
sandbox cannot reach (socket, connector jar, offset commit).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set — real-broker smoke needs an env "
    "with a reachable Kafka and the spark-sql-kafka connector jar",
)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_kafka_produce_consume_parse_upsert_and_writeback(spark, tmp_path):
    from flink_ms_spark.functions.codecs import parse_model_line
    from flink_ms_spark.serving.store import ModelStore
    from flink_ms_spark.streaming.kafka import (
        decode_kafka_frames,
        read_bus_lines,
        write_bus_lines,
    )

    bus = f"kafka://{BOOTSTRAP}"
    topic_in = f"flinkms-smoke-in-{uuid.uuid4().hex[:8]}"
    topic_out = f"flinkms-smoke-out-{uuid.uuid4().hex[:8]}"

    # K2 produce: model lines → kafka sink (at-least-once via ckpt)
    prod_in = tmp_path / "prod_in"
    prod_in.mkdir()
    _write(str(prod_in / "m1.txt"), ["1,U,1.0;2.0", "2,I,3.0;4.0"])
    q = write_bus_lines(
        spark.readStream.text(str(prod_in)),
        bus,
        topic_in,
        str(tmp_path / "ckpt_prod"),
    )
    q.processAllAvailable()
    q.stop()

    # S7 consume → T2 parse → P1 keyBy → K4 queryable-state upsert
    consumed = read_bus_lines(spark, bus, topic_in)
    assert consumed.isStreaming
    store = ModelStore(spark, f"KAFKA_SMOKE_{uuid.uuid4().hex[:6]}")

    def upsert(batch_df, _bid):
        parsed = batch_df.select(
            *parse_model_line("value"), F.col("kafka_offset")
        ).where(F.col("id").isNotNull())
        store.upsert_batch(parsed, ordinal_col="kafka_offset")

    qc = (
        consumed.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt_cons"))
        .trigger(availableNow=True)
        .start()
    )
    qc.awaitTermination(120)
    assert store.lookup("1-U").factors == [1.0, 2.0]
    assert store.lookup("2-I").factors == [3.0, 4.0]
    assert store.lookup("9-U") is None

    # K2 write-back: re-emit the served model to a second topic, then
    # batch-read it through the SAME frame codec the stream uses
    q2 = write_bus_lines(
        read_bus_lines(spark, bus, topic_in),
        bus,
        topic_out,
        str(tmp_path / "ckpt_back"),
    )
    q2.processAllAvailable()
    q2.stop()
    frames = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
    )
    values = sorted(r.value for r in decode_kafka_frames(frames).collect())
    assert values == ["1,U,1.0;2.0", "2,I,3.0;4.0"]
