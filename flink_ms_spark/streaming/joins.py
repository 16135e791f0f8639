"""Stream-stream joins with event-time bounds.

Absent from the reference (its only "joins" are state-lookup RPCs,
SURVEY.md §2.9/X4); on Spark they are the native way to correlate two
live streams — e.g. attribute conversion events to the trigger events
that preceded them. Both sides carry watermarks and the join predicate
carries a time bound, so the engine can expire buffered state: state
per key is bounded by (watermark delay + interval), which is what makes
a stream-stream join runnable against unbounded 100 TB/day inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Inner interval join: pair each right-stream row with left-stream
    rows of the same key where ``left_ts <= right_ts <= left_ts +
    max_delay`` (the click-after-impression shape).

    Column names on the output are prefixed ``l_`` / ``r_`` for the two
    timestamps; all other columns keep their side's names (callers
    should project/rename beforehand if both sides share names beyond
    the key).
    """
    lw = left.withWatermark(left_ts, watermark_delay).select(
        F.col(key), F.col(left_ts).alias("l_ts"), *[c for c in left.columns if c not in (key, left_ts)]
    )
    rw = right.withWatermark(right_ts, watermark_delay).select(
        F.col(key), F.col(right_ts).alias("r_ts"), *[c for c in right.columns if c not in (key, right_ts)]
    )
    cond = (
        (lw[key] == rw[key])
        & (rw["r_ts"] >= lw["l_ts"])
        & (rw["r_ts"] <= lw["l_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
