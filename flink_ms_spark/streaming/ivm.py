"""Incremental view maintenance — additive rollups kept current by a
stream, without re-scanning history.

The serving store (serving/store.py) merges by LATEST-per-key — right
for model rows, wrong for aggregates. This module is the other merge
semilattice: per-key ADDITIVE partials (sum/count are associative and
commutative, so per-batch partial aggs merge exactly). The pattern at
100 TB/day: never recompute `GROUP BY day` over the table; aggregate
each micro-batch (map-side combined, tiny output) and fold the partial
into the materialized view.

Mean/derived columns are computed at read time from (sum, count) —
storing them would break mergeability. Exactly-once: foreachBatch can
replay a batch after failure; the fold is idempotent per batch_id
(skip already-applied ids), which the test pins across a
checkpoint-recovery rerun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalRollup:
    """Driver-held materialized (key -> sum, count) view fed by
    foreachBatch partial aggregates.

    ``key_expr``/``value_col`` are column expressions evaluated on each
    micro-batch; the per-batch agg runs distributed and ships only
    group-cardinality rows to the fold.
    """

    def __init__(self, key_expr: str, value_col: str):
        self.key_expr = key_expr
        self.value_col = value_col
        self.view: dict = {}
        self.applied: set[int] = set()

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied:  # replayed batch — idempotent fold
            return
        partial = (
            batch_df.groupBy(F.expr(self.key_expr).alias("k"))
            .agg(
                F.sum(self.value_col).alias("s"),
                F.count(self.value_col).alias("c"),
            )
            .collect()
        )
        for r in partial:
            s, c = self.view.get(r.k, (0.0, 0))
            self.view[r.k] = (s + (r.s or 0.0), c + r.c)
        self.applied.add(batch_id)

    def snapshot(self) -> dict:
        """key -> (sum, count, mean) at this instant."""
        return {
            k: (s, c, s / c if c else None) for k, (s, c) in self.view.items()
        }

    def run(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        return (
            stream_df.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=available_now)
            .start()
        )
