"""Streaming heavy hitters — a Misra-Gries summary maintained across
micro-batches.

The batch operator (operators/sketches.py:heavy_hitter_terms) prunes
with per-partition MG summaries then exact-recounts; a stream can't
recount history, so the streaming form keeps ONE mergeable summary
alive across batches (Agarwal et al., "Mergeable Summaries", PODS'12):

- per micro-batch, each partition builds a ``sketch_k``-counter MG
  summary via ``mapInPandas`` (Arrow-vectorized, ≤ sketch_k rows out
  per partition — the only data that ever leaves the executors),
- the ≤ sketch_k × n_partitions summary rows are reduced by key and
  merged into a driver-held summary, re-pruned to ``sketch_k``
  counters.

State is O(sketch_k) forever; per-batch driver traffic is
O(sketch_k × partitions). Guarantees (inherited from MG merge): every
term with true total count > N/(sketch_k+1) is present, and each
reported counter undercounts its true count by at most
N/(sketch_k+1). That makes the candidate set a no-false-negative
superset for any threshold N/t with t ≤ sketch_k — the same contract
the batch path verifies exactly, minus the recount (a stream has no
second pass; run the batch operator over the accumulated table when
exact counts are needed).

``transformWithStateInPandas`` would hold the summary as engine state
instead of on the driver; it needs protobuf + RocksDB (gated — see
streaming/value_state.py), so the foreachBatch form is the portable
one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(df: DataFrame, col: str, sketch_k: int) -> DataFrame:
    """Per-partition MG summaries WITH surviving counter values:
    (col, cnt) rows, ≤ sketch_k per partition. Counters undercount by
    at most n_partition/(sketch_k+1)."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            bc = pdf[col].value_counts()
            counts = counts.add(bc, fill_value=0) if len(counts) else bc.astype("int64")
            if len(counts) > sketch_k:
                kth = counts.nlargest(sketch_k + 1).iloc[-1]
                counts = counts - kth
                counts = counts[counts > 0]
        yield pd.DataFrame(
            {col: counts.index.astype(str), "cnt": counts.to_numpy("int64")}
        )

    return df.select(col).mapInPandas(mg, f"{col} string, cnt long")


class StreamingHeavyHitters:
    """Driver-held mergeable MG summary fed by foreachBatch.

    ``candidates()`` returns the current (term, lower-bound count)
    summary, sorted by count descending.
    """

    def __init__(self, col: str = "term", sketch_k: int = 1000):
        self.col = col
        self.sketch_k = sketch_k
        self.counts: dict[str, int] = {}
        self.n_seen = 0

    def _prune(self) -> None:
        if len(self.counts) > self.sketch_k:
            kth = sorted(self.counts.values(), reverse=True)[self.sketch_k]
            self.counts = {
                t: c - kth for t, c in self.counts.items() if c - kth > 0
            }

    def update(self, batch_df: DataFrame, _batch_id: int | None = None) -> None:
        """foreachBatch hook: fold one micro-batch into the summary."""
        self.n_seen += batch_df.count()
        summary = (
            misra_gries_summaries(batch_df, self.col, self.sketch_k)
            .groupBy(self.col)
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        for r in summary:
            self.counts[r[0]] = self.counts.get(r[0], 0) + r[1]
        self._prune()

    def candidates(self) -> list[tuple[str, int]]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach to a streaming DataFrame of (col) rows; returns the
        started StreamingQuery."""
        return (
            stream_df.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=available_now)
            .start()
        )
