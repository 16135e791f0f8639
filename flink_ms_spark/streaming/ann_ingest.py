"""Streaming ANN index maintenance: PQ-encode arriving embedding
batches against the FROZEN codebooks of a persisted index
(``build_pq_index``) and land them as idempotent per-batch increment
partitions beside the base code table. Serving unions base + live
increments through ``load_codes`` — the index stays fresh without
retraining, and a replayed micro-batch overwrites its own partition
(exactly-once, same ``batch_id=N`` dynamic-overwrite pattern as
``streaming/ingest.py``).

Why frozen codebooks are the right trade: PQ cell boundaries only
need retraining when the embedding DISTRIBUTION moves (monitored by
``centroid_drift`` / ``streaming/drift.py``), not when rows arrive.
Encoding is a broadcast-codebook map — no shuffle, no state — so the
streaming path is scan-speed; the expensive Lloyd training stays a
rare offline job.

Id collisions resolve by recency: an id re-sent in a later batch
supersedes its earlier code row (and any base row) at load time via a
vec_id-keyed window — fully parallel, never a global sort. The base
table has batch_id −1, so any increment wins over base.
"""

from __future__ import annotations


import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ms_spark import fsutil
from flink_ms_spark.operators.similarity import load_pq_codebooks, pq_encode

_INC = "codes_increments"


class StreamingAnnIngest:
    """foreachBatch worker: encode + land one increment partition per
    micro-batch."""

    def __init__(self, spark: SparkSession, index_path: str,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.index_path = index_path
        self.id_col = id_col
        self.vec_col = vec_col
        self.codebooks: np.ndarray = load_pq_codebooks(spark, index_path)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        out = fsutil.join(self.index_path, _INC, f"batch_id={batch_id}")
        codes = pq_encode(batch_df, self.codebooks,
                          id_col=self.id_col, vec_col=self.vec_col)
        # a micro-batch may carry the same id twice; "latest" within
        # one batch is undefined (no intrinsic order), but the landed
        # row must be DETERMINISTIC or load_codes' recency window
        # breaks ties differently run-to-run (replays stop being
        # idempotent). Collapse to max(code) — arbitrary but stable.
        codes = codes.groupBy(self.id_col).agg(F.max("code").alias("code"))
        codes.write.mode("overwrite").parquet(out)

    def run(self, stream_df: DataFrame, checkpoint: str,
            available_now: bool = True):
        writer = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def load_codes(spark: SparkSession, index_path: str,
               id_col: str = "vec_id") -> DataFrame:
    """The serving view of the code table: base codes plus any landed
    increments, latest batch winning per id. Pass the result to
    ``pq_topk_codes`` exactly like the base table."""
    base = spark.read.parquet(fsutil.join(index_path, "codes")).select(
        F.col(id_col), "code", F.lit(-1).cast("long").alias("_b")
    )
    inc_path = fsutil.join(index_path, _INC)
    # fsutil, not os.path: an index on shared storage must not silently
    # serve STALE codes because the driver's local disk lacks inc_path
    if not fsutil.is_dir(spark, inc_path):
        return base.drop("_b")
    inc = spark.read.parquet(inc_path).select(
        F.col(id_col), "code", F.col("batch_id").cast("long").alias("_b")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_b").desc())
    return (
        base.unionByName(inc)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, "code")
    )
