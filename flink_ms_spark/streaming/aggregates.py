"""Event-time streaming aggregations.

The reference is purely processing-time (SURVEY.md §2.9 — no
event-time, no watermarks, no windows anywhere in its 19 sources); the
Spark engine exposes Structured Streaming's event-time machinery as the
native upgrade path: tumbling/sliding windows over a watermarked
timestamp column, with late data beyond the watermark dropped instead
of corrupting closed windows.

State scale: the open-window state per key is bounded by
(watermark delay / slide) windows; the watermark is what lets a
100 TB/day stream run with finite state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time counts
    per key: (window_start, window_end, key, n_events, total_value).

    With a streaming input this is an append-mode query: a window's row
    is emitted once the watermark passes its end, and rows later than
    the watermark are dropped — deterministic results under reordered
    delivery, the property the reference's processing-time pipeline
    cannot offer.
    """
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_windowed_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows: per-key activity bursts closed by a
    ``gap`` of inactivity — (session_start, session_end, key, n_events,
    total_value).

    Unlike tumbling windows, session extents are data-driven: Spark
    merges overlapping [ts, ts+gap) intervals in state and a session
    row is emitted (append mode) once the watermark passes its end.
    State per key is the open sessions only — the watermark bounds it
    exactly as for fixed windows. The batch twin is the catalog's
    `session_window_agg` query; the group alias is
    ``session_window.start`` (not ``window.start``).
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("session_window"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
