"""Streaming corpus curation — the batch `curate` job's semantics on an
unbounded document stream: quality gate → PII scrub → exact dedup
within the watermark horizon.

The whole pipeline is stateless row-level column math EXCEPT the dedup,
whose keyed digest state the engine bounds by the watermark — so state
size tracks the dedup horizon, not stream history. Gate-then-scrub
order matters twice over: rejected docs never pay the scrub regexes,
and (at scale) the filter runs before the shuffle that dedup's state
operator induces, so shuffled bytes are survivors-only.

Reference scope note: the reference's streaming jobs are model-serving
consumers (SURVEY.md §3.2); this op is part of the north-star
training-data extension, reusing the same source/checkpoint machinery
(streaming/loader.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_ms_spark.operators.text import scrub_pii, token_count
from flink_ms_spark.streaming.dedup import streaming_exact_dedup


def streaming_curate(
    stream: DataFrame,
    min_tokens: int = 20,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Curated append stream: docs passing the token gate, scrubbed,
    first-seen-unique by content digest within the watermark. The
    digest is computed on the ORIGINAL text (same as batch
    exact_dedup_groups), so scrubbing can't merge distinct documents
    that share post-scrub text."""
    gated = stream.where(token_count(text_col) >= min_tokens)
    deduped = streaming_exact_dedup(
        gated, text_col=text_col, ts_col=ts_col, watermark_delay=watermark_delay
    )
    return deduped.withColumn(text_col, scrub_pii(text_col)).withColumn(
        "n_tokens", token_count(text_col)
    )
