"""Engine-managed keyed state via ``applyInPandasWithState`` — the
Flink ValueState analogue that RUNS in this container (unlike
``transformWithStateInPandas``, which needs protobuf; see
streaming/value_state.py for that gated variant).

Spark's ``groupBy(key).applyInPandasWithState`` gives each key a
GroupState object persisted in the engine's checkpointed state store —
exactly the construct behind the reference's queryable model state
(``keyBy(0).asQueryableState(...)``, als-ms ALSKafkaConsumer.java:84-92)
and its SGD factor state (SGD.java:160-234 keeps per-key factors in
open()/ValueState). Three operators:

- :func:`latest_per_key_changelog` — ValueState latest-wins upsert;
  each batch emits the changelog of touched keys (key, payload), which
  a foreachBatch mirror turns into the point-lookup view. State size:
  one row per key — the model table itself, sharded by the engine.
- :func:`running_stats_state` — per-key running count/sum/mean (online
  feature aggregation); state is three numbers per key, emission is
  the updated rows per batch. The additive state is what makes restart
  recovery exact: the checkpoint holds (n, s), not raw history.
- :func:`session_close_state` — timer-closed gap sessions (the Flink
  ProcessFunction-with-timer pattern): emits a session when a larger
  gap arrives OR when the engine's processing-time timer fires for a
  key that simply went silent.

Scale: state is partitioned by the groupBy key across executors and
checkpointed incrementally; nothing driver-side. The changelog
emission pattern (emit only touched keys) keeps per-batch output
O(batch), not O(state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHANGELOG_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("payload", StringType(), True),
    ]
)
_LATEST_STATE = StructType([StructField("payload", StringType(), True)])

STATS_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("mean", DoubleType(), True),
    ]
)
_STATS_STATE = StructType(
    [StructField("n", LongType(), True), StructField("total", DoubleType(), True)]
)


def latest_per_key_changelog(
    stream: DataFrame,
    key_col: str = "key",
    payload_col: str = "payload",
    ord_col: str | None = None,
) -> DataFrame:
    """Latest-wins ValueState upsert: state holds the newest payload
    per key; each micro-batch emits (key, payload) for keys it
    touched. Pass ``ord_col`` (an offset/sequence column) to make the
    within-batch winner deterministic — without it the LAST row in
    arrival order wins, which matches the reference consumer's
    single-partition overwrite semantics but is chunk-order-dependent
    once a key's updates span source partitions (the engine does not
    guarantee row order across the shuffle; the
    ``transformWithStateInPandas`` sibling in ``value_state.py``
    carries ``ord`` for exactly this reason)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # columns were canonicalized to payload/_ord by the selectExpr
        latest = state.get[0] if state.exists else None
        best_ord = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            if ord_col is None:
                latest = pdf["payload"].iloc[-1]
            else:
                i = pdf["_ord"].idxmax()
                o = pdf["_ord"].loc[i]
                if best_ord is None or o >= best_ord:
                    best_ord, latest = o, pdf["payload"].loc[i]
        state.update((latest,))
        yield pd.DataFrame({"key": [key[0]], "payload": [latest]})

    cols = [f"{key_col} AS key", f"{payload_col} AS payload"]
    if ord_col is not None:
        cols.append(f"{ord_col} AS _ord")
    return (
        stream.selectExpr(*cols)
        .groupBy("key")
        .applyInPandasWithState(
            fn, CHANGELOG_SCHEMA, _LATEST_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )


def running_stats_state(
    stream: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Per-key running (n, total, mean) with engine-managed state —
    the online-feature-aggregation primitive. Emits the updated stats
    row for every key a batch touches."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].sum())  # canonicalized name
        state.update((n, total))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "total": [total],
                "mean": [total / n if n else None],
            }
        )

    return (
        stream.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
        .groupBy("key")
        .applyInPandasWithState(
            fn, STATS_SCHEMA, _STATS_STATE, "update", GroupStateTimeout.NoTimeout
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("session_start", DoubleType(), True),
        StructField("session_end", DoubleType(), True),
        StructField("n_events", LongType(), True),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start", DoubleType(), True),
        StructField("last", DoubleType(), True),
        StructField("n", LongType(), True),
    ]
)


def session_close_state(
    stream: DataFrame,
    gap_seconds: float = 1800.0,
    key_col: str = "key",
    ts_col: str = "ts_sec",
) -> DataFrame:
    """Timer-closed sessions — the Flink ProcessFunction-with-timer
    pattern (reference family X: keyed state + timers) as
    ``applyInPandasWithState`` with ``ProcessingTimeTimeout``: state
    holds the open session (start, last, n); rows extend it or — on a
    gap larger than ``gap_seconds`` between event times — close it and
    emit the finished session. A key silent past the timeout has its
    open session flushed by the engine's timer (the ``state.hasTimedOut``
    branch), so sessions are emitted even when a key simply stops.

    Emits ONLY closed sessions (append semantics): the difference from
    the native ``session_window`` aggregation
    (streaming/aggregates.py), which emits windows on watermark close
    — this form is the custom-logic escape hatch (per-session enrich /
    side effects) with the same bounded keyed state.
    """
    import pandas as pd_mod

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd_mod.DataFrame(
                    {
                        "key": [key[0]],
                        "session_start": [start],
                        "session_end": [last],
                        "n_events": [n],
                    }
                )
            return
        start, last, n = (state.get if state.exists else (None, None, 0))
        closed = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(float(t) for t in pdf[ts_col])
        for t in sorted(ts_all):
            if start is None:
                start, last, n = t, t, 1
            elif t < start - gap_seconds:
                # stale event: it belongs to a session that closed
                # before this one opened (its owner's state is gone) —
                # emit it as a degenerate closed session rather than
                # folding it in, which would fabricate a session
                # spanning a silence longer than the gap
                closed.append((t, t, 1))
            elif t - last > gap_seconds:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                # late event within gap of the open session: extend the
                # count; bounds may widen by at most gap_seconds (the
                # stale branch above caps how far start can rewind)
                start, last, n = min(start, t), max(last, t), n + 1
        state.update((start, last, n))
        state.setTimeoutDuration(int(gap_seconds * 1000))
        if closed:
            yield pd_mod.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        stream.selectExpr(f"{key_col} AS key", f"{ts_col} AS {ts_col}")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
