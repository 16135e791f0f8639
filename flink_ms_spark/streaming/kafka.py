"""Kafka boundary (SURVEY.md §2.1 S7, §2.2 K2, §2.6 X5-X7).

The reference publishes model text rows to Kafka with
flush-on-checkpoint at-least-once (ALSKafkaProducer.java:29-37,
``setFlushOnCheckpoint(true)``, ``setLogFailuresOnly(false)``) and
consumes them with FlinkKafkaConsumer010 + checkpointing + fixed-delay
restart (ALSKafkaConsumer.java:43-70).

Spark-first: the Structured Streaming kafka sink is at-least-once by
construction when a checkpointLocation is set (offsets commit after the
sink write), so K2's flush-on-checkpoint contract is the default, not a
flag.

There is no broker in this container, so the module ALSO provides a
file-backed bus stand-in behind the same (value, kafka_offset)
contract: ``read_bus_lines`` / ``write_bus_lines`` dispatch on the URI
scheme — ``kafka://host:port`` routes to the real connector,
``file:///dir`` to an append-only JSON topic directory whose producer
assigns broker-style monotone offsets. Tests run the FULL
produce → consume → parse → keyBy → upsert chain through the stand-in
(at-least-once semantics match: a replayed producer batch appends
duplicates, which last-write-wins upserts absorb — the same contract
the reference gets from flush-on-checkpoint Kafka).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# The record schema Spark's kafka source emits (Structured Streaming
# + Kafka integration guide; stable across releases). The codec below
# is written against THIS shape so it can be executed in tests on a
# recorded fixture DataFrame — the only thing a broker would add is
# the socket, not semantics.
KAFKA_FRAME_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, "
    "offset LONG, timestamp TIMESTAMP, timestampType INT"
)


def decode_kafka_frames(frames: DataFrame) -> DataFrame:
    """The S7 line codec, factored off the connector so it is
    executable without a broker: Kafka frames (KAFKA_FRAME_SCHEMA) →
    (value STRING, kafka_offset LONG). UTF-8 bytes→string is the
    reference's SimpleStringSchema deserialize
    (ALSKafkaConsumer.java:67-70); the offset feeds last-write-wins
    ordering in the store merge."""
    return frames.select(
        F.col("value").cast("string").alias("value"),
        F.col("offset").alias("kafka_offset"),
    )


def encode_kafka_value(lines: DataFrame) -> DataFrame:
    """The K2 line codec: any ``value`` column → the single STRING
    ``value`` column the kafka sink serializes (the reference's
    SimpleStringSchema serialize, ALSKafkaProducer.java:29-37). Shared
    by the real sink and the file-bus stand-in so both transports run
    the identical encode."""
    return lines.selectExpr("CAST(value AS STRING) AS value")


def read_kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S7 — Kafka streaming source of UTF-8 string values (the
    reference's SimpleStringSchema, ALSKafkaConsumer.java:67-70).
    Returns (value STRING, kafka_offset LONG) — the offset feeds
    last-write-wins ordering in the store merge. The frame→line codec
    is :func:`decode_kafka_frames` (fixture-executed in tests); only
    the connector wiring below needs a broker."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .transform(decode_kafka_frames)
    )


def write_kafka_lines(
    lines: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
):
    """K2 — at-least-once Kafka sink for a streaming DataFrame with a
    ``value`` column (reference ALSKafkaProducer.java:29-37; the
    checkpoint supplies the flush-on-checkpoint guarantee).

    Returns the started StreamingQuery.
    """
    writer = (
        encode_kafka_value(lines)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def _parse_bus_uri(uri: str) -> tuple[str, str]:
    for scheme in ("kafka://", "file://"):
        if uri.startswith(scheme):
            return scheme[:-3], uri[len(scheme) :]
    raise ValueError(f"unsupported bus uri (kafka:// or file://): {uri}")


def read_bus_lines(
    spark: SparkSession,
    uri: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S7 behind a transport-dispatching URI: ``kafka://host:port`` →
    real Kafka connector; ``file:///dir`` → file-backed topic stand-in
    (always earliest — the stand-in keeps the log, like a compacted
    topic). Same (value STRING, kafka_offset LONG) contract either
    way, so everything downstream is transport-agnostic."""
    scheme, rest = _parse_bus_uri(uri)
    if scheme == "kafka":
        return read_kafka_lines(spark, rest, topic, starting_offsets)
    return spark.readStream.schema("value STRING, kafka_offset LONG").json(
        os.path.join(rest, topic)
    )


def write_bus_lines(
    lines: DataFrame,
    uri: str,
    topic: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
):
    """K2 behind the same URI dispatch. The file stand-in appends each
    micro-batch as JSON into the topic dir with broker-style offsets
    (batch_id * 2^48 + monotonically_increasing_id — monotone across
    batches, unique within one; a test double, not a scale claim).
    At-least-once matches Kafka: a replayed batch appends duplicate
    records with fresh offsets, and last-write-wins consumers absorb
    them. Returns the started StreamingQuery."""
    scheme, rest = _parse_bus_uri(uri)
    if scheme == "kafka":
        return write_kafka_lines(lines, rest, topic, checkpoint_dir, trigger_interval)
    topic_dir = os.path.join(rest, topic)

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        (
            encode_kafka_value(batch_df)
            .withColumn(
                "kafka_offset",
                F.lit(batch_id).cast("long") * F.lit(1 << 48).cast("long")
                + F.monotonically_increasing_id(),
            )
            .write.mode("append")
            .json(topic_dir)
        )

    writer = lines.writeStream.foreachBatch(emit).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_reliability_conf(
    state_backend: str = "rocksdb",
    task_retries: int = 3,
) -> dict[str, str]:
    """X6/X7 — session conf for the reference's reliability knobs:

    - state backend selection (``--stateBackend rocksdb|fs|memory``,
      ALSKafkaConsumer.java:53-65): RocksDB state store provider for
      larger-than-heap streaming state; ``fs``/``memory`` map to the
      default HDFS-backed provider (Spark keeps an in-memory map
      snapshot-backed to the checkpoint dir — the 'memory' and 'fs'
      cases differ only in checkpoint placement).
    - fixed-delay restart ×3 (ALSKafkaConsumer.java:48-51): task-level
      retries; query-level restart is the driver loop around
      ``query.awaitTermination`` (Spark restarts from the checkpoint).

    Pass to ``get_spark(extra_conf=...)``.
    """
    conf = {"spark.task.maxFailures": str(task_retries)}
    if state_backend == "rocksdb":
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    return conf
