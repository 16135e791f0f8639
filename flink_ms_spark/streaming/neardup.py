"""Streaming near-duplicate suppression at ingestion — the
incremental form of the MinHash-LSH batch dedup.

Batch LSH (operators/dedup.py:lsh_candidate_pairs) answers "which
pairs in this corpus collide"; an ingestion pipeline needs the online
form: "drop any arriving doc that collides with the corpus seen SO
FAR, and register the survivors". Flink would model this as keyed
state on band signature; Spark-first it is a ``foreachBatch`` loop
over a PERSISTED bucket registry:

per micro-batch
  1. compute MinHash band signatures for arriving docs (same
     md5+affine-reseed math as batch — one digest per shingle);
  2. anti-join the batch's signatures against the registry parquet
     (band_sig → keeper doc_id): any doc sharing a band signature
     with a registered keeper is a near-dup of the seen corpus and is
     dropped (first-seen-wins, matching batch ``lsh`` + min-id
     canonical semantics);
  3. within-batch collisions resolve to the min doc_id before the
     registry check (a batch is just a small corpus);
  4. append the surviving docs' signatures to the registry.

Scale story: the registry is the ONLY state and it is a plain
hash-partitioned parquet table keyed by band_sig — size is
O(corpus × bands), compactable offline, and the per-batch probe is a
keyed join (broadcast when the batch is small, shuffle-on-band_sig
when not), never a scan of the corpus text. Exactly-once: the
registry append and the survivor sink both key on (batch_id, doc_id)
— a replayed batch overwrites its own partition rather than
double-registering (idempotent foreachBatch, the Spark analogue of
Flink's checkpointed keyed state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark.operators.dedup import minhash_signatures


def band_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, band, band_sig): LSH band signatures — same minhash
    math as the batch operator, bands of ``band_size`` rows each."""
    sigs = minhash_signatures(
        docs, num_hashes=num_hashes, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col,
    )
    return (
        sigs.withColumn("band", ((F.col("h") - 1) / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                    lambda s: F.concat_ws(":", s["h"], s["minhash"]),
                ),
            ).alias("band_sig")
        )
    )


class StreamingNearDup:
    """Incremental LSH near-dup filter over a document stream.

    ``registry_dir`` holds the persisted bucket registry; survivors of
    each batch are returned by :meth:`process_batch` (and collected in
    :attr:`kept` when run via :meth:`run`'s foreachBatch loop, which a
    test or a small job can inspect; a production job would write
    survivors to its corpus sink inside the same foreachBatch).
    """

    def __init__(
        self,
        registry_dir: str,
        num_hashes: int = 8,
        band_size: int = 2,
        shingle_n: int = 3,
    ):
        self.registry_dir = registry_dir
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.shingle_n = shingle_n
        self.kept: list[tuple] = []

    def _registry(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.registry_dir) or not any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.registry_dir)
            for f in fs
        ):
            return None
        return spark.read.parquet(self.registry_dir)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Returns the batch's surviving (non-near-dup) docs and
        registers their signatures. Idempotent per batch_id."""
        spark = batch_df.sparkSession
        bands = band_signatures(
            batch_df,
            num_hashes=self.num_hashes,
            band_size=self.band_size,
            shingle_n=self.shingle_n,
        ).persist()

        # within-batch: min doc id per colliding bucket survives
        batch_keeper = bands.groupBy("band", "band_sig").agg(
            F.min("doc_id").alias("keeper")
        )
        in_batch_kept = bands.join(
            batch_keeper, ["band", "band_sig"]
        ).groupBy("doc_id").agg(
            # a doc survives the within-batch round iff it is the
            # keeper of EVERY bucket it occupies (any lost bucket
            # means it collided with an earlier doc)
            F.min((F.col("doc_id") == F.col("keeper")).cast("int")).alias("ok")
        ).where(F.col("ok") == 1).select("doc_id")

        reg = self._registry(spark)
        if reg is not None:
            # registry probe: any shared (band, band_sig) with an
            # already-registered keeper ⇒ near-dup of the seen corpus.
            # Replay safety: ignore rows this same batch_id wrote.
            seen = reg.where(F.col("batch_id") != batch_id).select(
                "band", "band_sig"
            ).distinct()
            collide = (
                bands.join(in_batch_kept, "doc_id")
                .join(seen, ["band", "band_sig"])
                .select("doc_id")
                .distinct()
            )
            kept_ids = in_batch_kept.join(collide, "doc_id", "left_anti")
        else:
            kept_ids = in_batch_kept

        survivors = batch_df.join(kept_ids, "doc_id")
        # register survivors' signatures, idempotently per batch
        (
            bands.join(kept_ids, "doc_id")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.registry_dir)
        )
        bands.unpersist()
        return survivors

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            rows = self.process_batch(batch_df, batch_id).collect()
            self.kept.extend(rows)

        writer = (
            stream_df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
