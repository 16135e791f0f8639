"""Streaming deduplication — the training-data pipeline's dedup family
applied to unbounded document streams.

Batch dedup (operators/dedup.py) answers "which of these N docs are
duplicates"; ingestion pipelines need the streaming form: "drop any doc
whose content digest was already seen". Spark-first that is
``dropDuplicatesWithinWatermark`` on the digest: engine-managed keyed
state, bounded by the watermark horizon (an UNbounded dropDuplicates
would grow state forever at 100 TB/day — the watermark is what makes
stream dedup feasible; exact global dedup across all history belongs in
the batch layer over the accumulated table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.operators.text import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming document source:
    adds the content digest (md5 of normalized text, same digest as
    batch ``exact_dedup_groups``) and drops rows whose digest already
    appeared within the watermark horizon."""
    withhash = stream.withColumn("text_hash", F.md5(normalize_text(text_col)))
    return withhash.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
