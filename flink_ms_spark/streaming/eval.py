"""Continuous model evaluation — the streaming form of the reference's
batch MSE job (MSE.java:26-69 computes one MSE against the served state
and exits; a serving platform wants that number PER ARRIVING BATCH so
model drift shows up as a trend, not a post-mortem).

Per micro-batch of rating lines:

1. parse (the reference's tab format, T1 semantics);
2. score against the CURRENT served model — a stream-static join with
   the store's latest-per-key view, broadcast (the same join that
   replaces the reference's per-record state RPCs);
3. skip-on-miss (inner join — MSE.java:128-148 break/continue parity);
4. append one metrics row ``(batch_id, n, mse)`` to a parquet ledger,
   idempotently per batch_id (replayed batches overwrite their row).

Scale: per-batch cost is the broadcast join over the batch; the ledger
is one row per micro-batch. Nothing driver-resident but the manifest
path — restarts resume from the checkpoint and the ledger's committed
rows stay (exactly-once via per-batch dynamic overwrite).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.operators.evaluate import mse
from flink_ms_spark.serving.store import ModelStore


class StreamingMSE:
    """foreachBatch loop appending per-batch MSE of arriving ratings
    against the served model to a parquet ledger."""

    def __init__(self, store: ModelStore, ledger_dir: str):
        self.store = store
        self.ledger_dir = ledger_dir

    def process_batch(self, ratings_batch: DataFrame, batch_id: int) -> None:
        model = self.store.view().select("id", "kind", "factors")
        row = mse(ratings_batch, model).collect()[0]
        spark = ratings_batch.sparkSession
        out = spark.createDataFrame(
            [(int(batch_id), int(row["n"]),
              float(row["mse"]) if row["mse"] is not None else None)],
            "batch_id LONG, n BIGINT, mse DOUBLE",
        )
        out.write.mode("overwrite").parquet(
            os.path.join(self.ledger_dir, f"batch_id={batch_id}")
        )

    def ledger(self, spark) -> DataFrame:
        return spark.read.parquet(self.ledger_dir)

    def run(self, ratings_stream: DataFrame, checkpoint: str,
            available_now: bool = True):
        writer = (
            ratings_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
