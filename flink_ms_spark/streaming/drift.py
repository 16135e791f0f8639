"""Streaming corpus-drift monitoring — distribution QA for a
training-data ingestion pipeline.

A corpus pipeline needs to notice when arriving data stops looking
like the corpus it was tuned on (new boilerplate source, encoding
breakage, language shift) BEFORE the batch lands in training shards.
The monitor compares each micro-batch's hashed-token distribution
against a baseline profile:

- profile: token → md5 bucket (the DSIR feature space,
  operators/mixing.py:md5_bucket) → ``n_buckets`` counts. Model-scale
  by construction regardless of vocabulary (the same reason DSIR
  hashes its features).
- score: add-1-smoothed KL(batch ‖ baseline) in bits. KL is the
  right asymmetry — it spikes when the batch concentrates mass where
  the baseline has little (novel content), not when the batch merely
  undersamples the baseline.

Scale: the per-batch work is one groupBy(bucket) count (map-side
combined, ``n_buckets`` result rows); the baseline is a broadcast-
sized vector; the fold state is one counter vector. Flink would make
this a keyed ProcessFunction with a metrics sink; Spark-first it is
the foreachBatch fold every other monitor in streaming/ uses.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.operators.mixing import md5_bucket
from flink_ms_spark.operators.text import tokens


def bucket_profile(
    df: DataFrame, text_col: str = "text", n_buckets: int = 64
) -> dict[int, int]:
    """Hashed-token bucket counts of a corpus — the baseline profile
    (one aggregate, ``n_buckets`` rows collected)."""
    rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .select(md5_bucket("t", n_buckets).alias("bkt"))
        .groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {int(r.bkt): int(r.n) for r in rows}


def kl_bits(
    batch: dict[int, int], baseline: dict[int, int], n_buckets: int = 64
) -> float:
    """Add-1-smoothed KL(batch ‖ baseline) in bits."""
    nb = sum(batch.values()) + n_buckets
    nb0 = sum(baseline.values()) + n_buckets
    kl = 0.0
    for b in range(n_buckets):
        p = (batch.get(b, 0) + 1) / nb
        q = (baseline.get(b, 0) + 1) / nb0
        kl += p * math.log2(p / q)
    return kl


class StreamingDriftMonitor:
    """foreachBatch drift scores vs a fixed baseline profile.

    ``scores`` collects (batch_id, n_tokens, kl_bits, drifted); a
    production job would push them to its metrics sink and gate the
    batch on ``drifted`` before shard writes.
    """

    def __init__(
        self,
        baseline: dict[int, int],
        text_col: str = "text",
        n_buckets: int = 64,
        threshold_bits: float = 0.1,
    ):
        self.baseline = baseline
        self.text_col = text_col
        self.n_buckets = n_buckets
        self.threshold_bits = threshold_bits
        self.scores: list[tuple[int, int, float, bool]] = []

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        prof = bucket_profile(batch_df, self.text_col, self.n_buckets)
        n = sum(prof.values())
        kl = kl_bits(prof, self.baseline, self.n_buckets)
        self.scores.append((batch_id, n, kl, kl > self.threshold_bits))

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream_df.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class StreamingEwma:
    """Per-key EWMA of a metric column, folded per micro-batch — the
    streaming counterpart of the batch ``ewma_smooth`` query.

    The batch plan must LINEARIZE the recursion to stay declarative
    (renormalized 2^t blocks, plans/relational.py); a stream gets the
    recursion for free: batch b contributes each key's mean x_b and
    the fold is s ← alpha·x_b + (1-alpha)·s (seed s = first observed
    x). No overflow hazard at any series length — this is the
    "streaming EWMA per-batch fold" escape hatch SCALING.md names for
    minute-/event-grain series.

    Scale: per-batch work is one map-side-combined groupBy(key) avg
    (result rows = |keys|); driver state is one double per key —
    O(keys), same envelope as every monitor in streaming/. ``history``
    collects (batch_id, key, x, ewma) for the metrics sink; a restart
    replays the last unfinished batch, so a production sink should
    upsert by (batch_id, key) — the idempotent-ledger pattern used by
    streaming/eval.py — rather than append.

    RESTART CAVEAT (ADVICE r5): the per-key smoothed values live in an
    in-memory dict, NOT in the checkpoint — on a checkpointed query
    restart the dict is empty and every key silently RESEEDS
    (s = first post-restart x), discontinuing the smoothed series.
    A restarting job must call :meth:`seed_state_from` on its ledger
    sink (latest ewma per key) before :meth:`run`; without it the
    series restarts from scratch, which is only acceptable for
    monitors that tolerate a re-warmup window.
    """

    def __init__(self, alpha: float = 0.5, key_col: str = "event_type",
                 value_col: str = "value"):
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha must be in (0, 1], got {alpha}")
        self.alpha = alpha
        self.key_col = key_col
        self.value_col = value_col
        self.state: dict[str, float] = {}
        self.history: list[tuple[int, str, float, float]] = []

    def seed_state_from(self, ledger: DataFrame, batch_col: str = "batch_id",
                        key_col: str = "key", ewma_col: str = "ewma") -> int:
        """Re-seed the in-memory state from a persisted (batch_id, key,
        x, ewma) ledger after a restart: each key resumes from the ewma
        of its highest batch_id, so the recursion continues instead of
        reseeding from the first post-restart observation. One keyed
        aggregate (max_by), result rows = |keys| — the same O(keys)
        envelope as the state itself. Returns the number of keys
        seeded."""
        rows = (
            ledger.groupBy(key_col)
            .agg(F.max_by(ewma_col, batch_col).alias("s"))
            .collect()
        )
        for r in rows:
            self.state[r[0]] = float(r.s)
        return len(rows)

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.groupBy(self.key_col)
            .agg(F.avg(self.value_col).alias("x"))
            .collect()
        )
        for r in rows:
            key, x = r[0], float(r.x)
            prev = self.state.get(key)
            s = x if prev is None else self.alpha * x + (1 - self.alpha) * prev
            self.state[key] = s
            self.history.append((batch_id, key, x, s))

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream_df.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
