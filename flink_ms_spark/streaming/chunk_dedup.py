"""Incremental chunk-level dedup over a document stream — the
streaming twin of the ``cdc_chunk_dedup`` batch report.

Near-dup LSH (streaming/neardup.py) admits or rejects a document on
SIGNATURE collision; chunk-level dedup measures how much of the
document's actual CONTENT the corpus already holds — robust to edits
(content-defined boundaries, operators/chunking.py) and to documents
assembled from previously-seen pieces (boilerplate quilts), which no
whole-doc signature catches. A document is rejected when the share of
its characters living in already-owned chunks exceeds
``max_dup_ratio``.

Registry layout: ``registry_dir/batch_id=N/`` parquet of the ADMITTED
docs' chunk rows (doc_id, chunk_hash, length) — the same idempotent
dynamic-partition-overwrite discipline as the neardup registry, so a
replayed micro-batch rewrites its own partition.

Decision determinism under replay (the neardup doc_id-keyed rule,
extended to chunk granularity):

- WITHIN a batch, every chunk hash has one canonical owner — the
  smallest (doc_id, chunk_idx) over the WHOLE batch, admitted or not —
  so the intra-batch verdict depends only on batch content, which a
  replay repeats bit-for-bit;
- the REGISTRY probe counts a chunk as duplicated only when its hash
  is registered to a DIFFERENT doc_id, so a replayed batch's admitted
  docs find their own first-attempt rows and do not self-collide;
- rejected docs never enter the registry, so their verdicts cannot
  drift across replays either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark import fsutil
from flink_ms_spark.operators.chunking import cdc_chunk_spans


class StreamingChunkDedup:
    """foreachBatch worker: admit docs whose chunk-duplication ratio
    against (batch canon + registry) stays at or below
    ``max_dup_ratio``; register admitted docs' chunks idempotently."""

    def __init__(
        self,
        registry_dir: str,
        max_dup_ratio: float = 0.5,
        window: int = 8,
        min_len: int = 16,
        max_len: int = 128,
        divisor: int = 16,
        out_dir: str | None = None,
    ):
        self.registry_dir = registry_dir
        self.max_dup_ratio = max_dup_ratio
        self.chunk_params = dict(
            window=window, min_len=min_len, max_len=max_len, divisor=divisor
        )
        self.out_dir = out_dir

    def _registry(self, spark: SparkSession) -> DataFrame | None:
        # fsutil, not os.path: a shared-storage registry URI must not
        # read as "empty" just because the driver's disk lacks it
        if fsutil.count_files(spark, self.registry_dir, ".parquet") == 0:
            return None
        return spark.read.parquet(self.registry_dir)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Returns the batch's admitted docs; registers their chunks.
        Idempotent per batch_id."""
        spark = batch_df.sparkSession
        spans = cdc_chunk_spans(batch_df, **self.chunk_params).persist()

        # within-batch canonical owner per chunk hash (admission-blind
        # and therefore replay-stable — see module docstring)
        canon = spans.groupBy("chunk_hash").agg(
            F.min(F.struct("doc_id", "chunk_idx")).alias("_canon")
        )
        flagged = spans.join(canon, "chunk_hash").withColumn(
            "_intra_dup", F.col("doc_id") != F.col("_canon.doc_id")
        )

        reg = self._registry(spark)
        if reg is not None:
            seen = (
                reg.select("chunk_hash", F.col("doc_id").alias("_reg_doc"))
                .distinct()
            )
            flagged = (
                flagged.join(seen, "chunk_hash", "left")
                .withColumn(
                    "_reg_dup",
                    F.col("_reg_doc").isNotNull()
                    & (F.col("_reg_doc") != F.col("doc_id")),
                )
                # a hash may match several registry owners; one foreign
                # owner suffices — collapse back to one row per chunk
                .groupBy("doc_id", "chunk_idx", "length", "_intra_dup")
                .agg(F.max("_reg_dup").alias("_reg_dup"))
            )
        else:
            flagged = flagged.withColumn("_reg_dup", F.lit(False))

        verdict = (
            flagged.withColumn(
                "_dup", F.col("_intra_dup") | F.col("_reg_dup")
            )
            .groupBy("doc_id")
            .agg(
                F.sum("length").alias("_chars"),
                F.sum(F.when(F.col("_dup"), F.col("length")).otherwise(0)).alias(
                    "_dup_chars"
                ),
            )
            .where(
                F.col("_dup_chars")
                <= F.lit(self.max_dup_ratio) * F.col("_chars")
            )
            .select("doc_id")
        )
        # materialize BEFORE the registry write: the verdict plan reads
        # the registry files the overwrite below replaces
        kept_ids = verdict.localCheckpoint(eager=True)
        survivors = batch_df.join(kept_ids, "doc_id")
        (
            spans.join(kept_ids, "doc_id")
            .select("doc_id", "chunk_hash", "length")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.registry_dir)
        )
        spans.unpersist()
        return survivors

    def _sink(self, batch_df: DataFrame, batch_id: int) -> None:
        survivors = self.process_batch(batch_df, batch_id)
        if self.out_dir is None:
            raise ValueError(
                "StreamingChunkDedup.run needs out_dir — survivors are "
                "stream-scale and must not collect on the driver"
            )
        survivors.write.mode("overwrite").parquet(
            fsutil.join(self.out_dir, f"batch_id={batch_id}")
        )

    def run(self, stream_df: DataFrame, checkpoint: str,
            available_now: bool = True):
        writer = stream_df.writeStream.foreachBatch(self._sink).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
