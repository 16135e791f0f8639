"""Structured Streaming pipelines (SURVEY.md §2.1 S5/S7, §2.2 K2/K4,
§2.6 X1/X4/X5, §3.2).

The reference's serving pipeline is Kafka → parse → keyBy →
queryable ValueState (ALSKafkaConsumer.java:67-92). Spark-first that
becomes: file/kafka stream source → parse (same codecs as batch) →
``foreachBatch`` latest-per-key merge into the ModelStore, with a
checkpoint location for exactly-once state progression. The online-SGD
job (SGD.java:49-85) becomes the same loop with an sgd_step between
parse and merge — the per-record state RPCs of the reference are
replaced by a stream-static join per micro-batch (X4 → join; the
reference is itself eventually consistent through its Kafka loop, so
semantics align at batch boundaries).

File source is used in tests (no Kafka broker in this environment);
``source='kafka'`` wires the same pipeline to a broker when present.
Checkpointing (X5) is the ``checkpointLocation`` option; the 60s
default interval maps to the processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark.functions.codecs import parse_model_line
from flink_ms_spark.operators.sgd import sgd_step
from flink_ms_spark.serving.store import ModelStore, apply_cdc_batch
from flink_ms_spark.sources.text import parse_rating_lines


def _text_stream(spark: SparkSession, path: str, source: str, kafka_options: dict | None):
    if source == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in (kafka_options or {}).items():
            reader = reader.option(k, v)
        return reader.load().select(F.col("value").cast("string").alias("value"))
    return spark.readStream.text(path)


def stream_model_into_store(
    spark: SparkSession,
    path: str,
    store: ModelStore,
    checkpoint_dir: str,
    source: str = "file",
    kafka_options: dict | None = None,
    available_now: bool = True,
    trigger_interval: str = "60 seconds",
):
    """Model pipeline: text stream of ``id,KIND,f1;f2;...`` rows →
    latest-per-key upsert into the store (K4/X1 semantics).

    ``available_now=True`` drains what exists and stops (test/batch
    bootstrap — reference PROCESS_ONCE, SGD.java:55-60); otherwise runs
    continuously with the processing-time trigger (PROCESS_CONTINUOUSLY,
    SGD.java:49-54; the reference's 60s default interval).
    """
    lines = _text_stream(spark, path, source, kafka_options)
    parsed = lines.select(*parse_model_line("value")).where(F.col("id").isNotNull())

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        store.upsert_batch(batch_df)

    writer = parsed.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def stream_cdc_into_store(
    spark: SparkSession,
    path: str,
    store: ModelStore,
    checkpoint_dir: str,
    available_now: bool = True,
    trigger_interval: str = "60 seconds",
):
    """CDC change-feed loader: text stream of ``key,OP,x`` lines (OP =
    ``U`` upsert / ``D`` tombstone) applied to the store with
    latest-op-per-key-wins micro-batch semantics via
    :func:`flink_ms_spark.serving.store.apply_cdc_batch` — the
    streaming twin of the ``cdc_upsert_merge`` catalog query, and the
    delete-capable extension of :func:`stream_model_into_store`
    (the reference's consumer is upsert-only,
    ALSKafkaConsumer.java:85-92). Spilled stores pay only a
    touched-bucket rewrite per micro-batch on BOTH arms."""
    lines = spark.readStream.text(path)
    parts = F.split(F.col("value"), ",")
    parsed = lines.select(
        parts.getItem(0).alias("key"),
        parts.getItem(1).alias("op"),
        parts.getItem(2).cast("double").alias("x"),
    ).where(F.col("key").isNotNull() & (F.col("key") != ""))

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(store, batch_df)

    writer = parsed.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def run_online_sgd_stream(
    spark: SparkSession,
    ratings_path: str,
    store: ModelStore,
    checkpoint_dir: str,
    learning_rate: float = 0.1,
    user_reg: float = 0.0,
    item_reg: float = 0.0,
    sep: str = "\t",
    available_now: bool = True,
):
    """Online SGD (M6): rating stream → per-micro-batch
    model-join update → merge back into the serving store.

    Every batch reads the CURRENT store view (stream-static join
    against the latest snapshot), applies one simultaneous-update step
    and merges last-write-wins — the Spark-native shape of the
    reference's read-state/update/write-Kafka loop (SGD.java:160-234).
    Mean-vector cold-start rows (MEAN-U/MEAN-I) are honored when
    present in the store (M7).
    """
    lines = spark.readStream.text(ratings_path)
    ratings = parse_rating_lines(lines, sep=sep).where(F.col("user_id").isNotNull())

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        model = store.view().select("id", "kind", "factors")
        mean_u = model.where((F.col("id") == "MEAN") & (F.col("kind") == "U")).select("factors")
        mean_i = model.where((F.col("id") == "MEAN") & (F.col("kind") == "I")).select("factors")
        updates = sgd_step(
            batch_df,
            model.where(F.col("id") != "MEAN"),
            user_mean=mean_u if mean_u.take(1) else None,
            item_mean=mean_i if mean_i.take(1) else None,
            learning_rate=learning_rate,
            user_reg=user_reg,
            item_reg=item_reg,
        )
        kv = updates.select(
            F.concat_ws("-", "id", "kind").alias("key"), "id", "kind", "factors"
        )
        store.upsert_batch(kv)

    writer = ratings.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
