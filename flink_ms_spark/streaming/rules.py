"""Dynamic rule filtering — the Flink *broadcast state pattern*
re-expressed Spark-first.

Flink broadcasts a control stream of rules to every task and keeps
them in broadcast state; the data stream is filtered/enriched against
the current rules without restarting the job. Structured Streaming
has no broadcast state, but the same contract falls out of
``foreachBatch``: every micro-batch re-reads the (tiny) rules table
and applies it with a broadcast join — rule changes take effect at
the next batch boundary, no restart, exactly the operational
behavior the pattern exists for.

Rules here are the corpus-gating kind a curation pipeline hot-tunes:
per-source bans and a minimum token count. The rules file is a JSON
document (atomic single-file replace ⇒ no torn reads); at scale it
would be a parquet/Delta table — same per-batch read, same broadcast.

Scale: the rules read is O(rules) per batch (seconds apart), the
apply is a broadcast hash join / codegen'd filter on the batch — no
shuffle, no state beyond the checkpoint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.operators.text import token_count

DEFAULT_RULES = {"banned_sources": [], "min_tokens": 0}


def load_rules(path: str) -> dict:
    if not os.path.exists(path):
        return dict(DEFAULT_RULES)
    with open(path) as f:
        loaded = json.load(f)
    return {**DEFAULT_RULES, **loaded}


def apply_rules(batch_df: DataFrame, rules: dict) -> DataFrame:
    """Filter a document batch by the current rules. Banned sources
    ride an isin (broadcast-literal) predicate; the token gate is a
    codegen'd column filter — both reach the scan as pushdowns in the
    batch plan."""
    out = batch_df
    banned = rules.get("banned_sources") or []
    if banned:
        # NULL-source rows must survive a ban list: NULL.isin(...) is
        # NULL, ~NULL is NULL, and WHERE drops NULL — so without the
        # isNull arm, adding ANY ban silently discards every document
        # with unset provenance
        out = out.where(
            F.col("source").isNull() | ~F.col("source").isin(banned)
        )
    min_tokens = int(rules.get("min_tokens") or 0)
    if min_tokens > 0:
        out = out.where(token_count("text") >= min_tokens)
    return out


class DynamicRuleFilter:
    """foreachBatch loop that re-reads ``rules_path`` every batch and
    applies the CURRENT rules — rule updates between batches take
    effect without restarting the query (the broadcast-state
    contract).

    Default usage is DISTRIBUTED: survivors are written to
    ``out_dir/batch_id=N`` parquet inside the same batch (idempotent
    per-batch overwrite — the streaming/ingest.py exactly-once
    pattern), so surviving rows never cross the driver. ``debug_keep``
    additionally collects survivors into :attr:`kept` for inspection in
    tests/small jobs; without ``out_dir`` that driver-side collect is
    the only sink and the filter is inspection-only by construction.
    """

    def __init__(
        self,
        rules_path: str,
        out_dir: str | None = None,
        debug_keep: bool = False,
    ):
        self.rules_path = rules_path
        self.out_dir = out_dir
        self.debug_keep = debug_keep or out_dir is None
        self.kept: list = []
        self.applied_rules: list[dict] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rules = load_rules(self.rules_path)
        self.applied_rules.append(rules)
        survivors = apply_rules(batch_df, rules)
        if self.out_dir is not None:
            survivors.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"batch_id={batch_id}")
            )
        if self.debug_keep:
            self.kept.extend(survivors.collect())

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
