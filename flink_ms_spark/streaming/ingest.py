"""Streaming ingestion capstone — the end-to-end corpus intake job a
training-data platform actually runs, composed from the round-2
streaming pieces in ONE foreachBatch pipeline per micro-batch:

1. **rules gate** (streaming/rules.py): hot-tunable bans/thresholds,
   re-read per batch (broadcast-state pattern — no restart);
2. **drift score** (streaming/drift.py): hashed-token KL vs the
   baseline profile; a drifted batch is quarantined to
   ``<out>/_quarantine`` instead of landing in training shards.
   The default threshold (4 bits) sits above the small-batch
   estimation bias — E[KL] of an in-distribution sample is ≈
   (B−1)/(2N·ln2) bits for N tokens over B buckets, so tiny batches
   score ~1-2 bits without any drift; production picks the threshold
   from that formula at its batch size;
3. **model-based quality gate** (ml/quality.py, optional): docs below
   ``quality_threshold`` on the frozen logistic quality model are
   dropped — the learned generalization of the boolean rule gates,
   applied as scan-speed column math inside the same batch plan;
4. **near-dup suppression** (streaming/neardup.py): incremental LSH
   registry — drop docs colliding with the already-ingested corpus;
5. **chunk-level content dedup** (streaming/chunk_dedup.py, optional
   via ``chunk_max_dup_ratio``): drop docs whose content-defined
   chunks are mostly already owned by the corpus — catches
   boilerplate quilts and heavy-edit near-copies that survive the
   whole-doc signature gate;
6. **curated write**: survivors land in ``batch_id=N`` parquet dirs
   (idempotent dynamic overwrite per batch → exactly-once under
   replay), and a running JSON manifest tracks per-batch decisions.

Scale: each stage is the one-shuffle/keyed-join shape documented in
its module; the composition adds no new shuffles — the batch flows
gate → score → registry probes → write, with only the dedup probes
shuffling. State = the band registry + the chunk registry (both
hash-partitioned parquet with compaction twins) + the drift baseline
(model-scale vector), nothing driver-resident but the manifest. Both
registries key replay-exclusion so a re-fired batch_id reaches
identical verdicts and rewrites only its own partitions.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from flink_ms_spark import fsutil

from flink_ms_spark.streaming.drift import bucket_profile, kl_bits
from flink_ms_spark.streaming.neardup import StreamingNearDup
from flink_ms_spark.streaming.rules import apply_rules, load_rules


class StreamingIngest:
    def __init__(
        self,
        out_dir: str,
        baseline: dict[int, int],
        rules_path: str | None = None,
        drift_threshold_bits: float = 4.0,
        quality_threshold: float | None = None,
        n_buckets: int = 64,
        chunk_max_dup_ratio: float | None = None,
    ):
        self.out_dir = out_dir
        self.baseline = baseline
        # the batch profile and the KL comparison MUST hash into the
        # same bucket space as the caller's baseline — a baseline built
        # with a different n_buckets would silently compare garbage
        self.n_buckets = n_buckets
        self.rules_path = rules_path
        self.drift_threshold_bits = drift_threshold_bits
        self.quality_threshold = quality_threshold
        self.neardup = StreamingNearDup(fsutil.join(out_dir, "_registry"))
        self.chunkdedup = None
        if chunk_max_dup_ratio is not None:
            from flink_ms_spark.streaming.chunk_dedup import StreamingChunkDedup

            self.chunkdedup = StreamingChunkDedup(
                fsutil.join(out_dir, "_chunk_registry"),
                max_dup_ratio=chunk_max_dup_ratio,
            )
        self.manifest: list[dict] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        n_in = batch_df.count()
        rules = load_rules(self.rules_path) if self.rules_path else {}
        gated = apply_rules(batch_df, rules) if rules else batch_df
        if self.quality_threshold is not None:
            from pyspark.sql import functions as F

            from flink_ms_spark.ml.quality import score_quality

            ok = score_quality(gated).where(
                F.col("quality_prob") >= self.quality_threshold
            ).select("doc_id")
            gated = gated.join(ok, "doc_id", "left_semi")
        # the gate+score plan feeds four consumers (count, drift
        # profile, near-dup probe, survivor write) — persist so the
        # per-batch hot path pays it once
        gated = gated.persist()
        n_gated = gated.count()

        kl = kl_bits(
            bucket_profile(gated, n_buckets=self.n_buckets),
            self.baseline,
            n_buckets=self.n_buckets,
        )
        if kl > self.drift_threshold_bits:
            # quarantine the whole batch: distribution shift means the
            # content shouldn't silently join the training corpus
            gated.write.mode("overwrite").parquet(
                fsutil.join(self.out_dir, "_quarantine", f"batch_id={batch_id}")
            )
            entry = {
                "batch_id": batch_id,
                "n_in": n_in,
                "n_gated": n_gated,
                "kl_bits": round(kl, 4),
                "action": "quarantined",
                "n_written": 0,
            }
        else:
            kept = self.neardup.process_batch(gated, batch_id)
            if self.chunkdedup is not None:
                # content-level gate AFTER the signature gate: only
                # signature-unique docs pay the chunking map, and only
                # their chunks enter the chunk registry
                kept = self.chunkdedup.process_batch(kept, batch_id)
            out = fsutil.join(self.out_dir, f"batch_id={batch_id}")
            kept.write.mode("overwrite").parquet(out)
            n_written = kept.sparkSession.read.parquet(out).count()
            entry = {
                "batch_id": batch_id,
                "n_in": n_in,
                "n_gated": n_gated,
                "kl_bits": round(kl, 4),
                "action": "ingested",
                "n_written": n_written,
            }
        spark = gated.sparkSession
        gated.unpersist()
        self.manifest.append(entry)
        # manifest flips through fsutil (write-tmp → rename): it sits
        # INSIDE the Spark sink dir, which is shared storage at scale
        fsutil.replace_text(
            spark,
            fsutil.join(self.out_dir, "_manifest.json"),
            json.dumps(self.manifest, indent=2),
        )

    def compact_registries(self, spark) -> dict:
        """Maintenance-window compaction of every registry this ingest
        owns (stream stopped, checkpoint committed — each compactor's
        documented contract). An EMPTY registry (every batch
        quarantined, or nothing ingested yet) is skipped, not an
        error — and never aborts the other registry's compaction.
        Returns per-registry stats.

        The chunk kind compacts whenever the live tier has rows OR a
        base manifest exists: compact_chunk_registry refolds the base
        and sweeps crash-orphaned generation dirs (flip-window debris
        from an earlier compaction) even with nothing live, so gating
        on live files alone would leave that debris unreclaimed until
        new batches happened to arrive."""
        from flink_ms_spark import fsutil
        from flink_ms_spark.streaming.chunk_dedup import base_manifest

        def _maybe(registry_dir, compact, has_base=False):
            if (
                fsutil.count_files(spark, registry_dir, ".parquet") == 0
                and not has_base
            ):
                return {"skipped": "empty registry"}
            return compact(spark)

        out = {
            "band": _maybe(self.neardup.registry_dir, self.neardup.compact)
        }
        if self.chunkdedup is not None:
            out["chunk"] = _maybe(
                self.chunkdedup.registry_dir,
                self.chunkdedup.compact,
                has_base=base_manifest(spark, self.chunkdedup.registry_dir)
                is not None,
            )
        return out

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
