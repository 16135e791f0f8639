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
storing them would break mergeability.

Exactly-once semantics are tiered (ADVICE r1 — the claim must match
the mechanism):
- in-process replay (foreachBatch re-delivering a batch after a task
  retry): the `applied` batch-id set makes the fold idempotent.
- process restart: only with a ``journal_dir``. Each batch's partials
  are journaled ATOMICALLY (tmp-file + rename) keyed by batch_id
  BEFORE the in-memory fold, and a restarted instance rebuilds the
  view purely from the journal, deduplicating by batch_id — so a
  crash at any point between fold and commit cannot double-apply.
  The journal is DRIVER-LOCAL state by design (os-level IO, a
  driver-mounted path): the view itself lives on the driver, so its
  recovery journal belongs beside it — unlike the store generations /
  registries / manifests, which are Spark-written shared-storage
  surfaces and go through fsutil.
  Without a journal, a restart starts from an empty view and relies on
  the stream checkpoint replaying ALL batches (availableNow jobs) —
  fine for batch-style reruns, not for long-lived views.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalRollup:
    """Driver-held materialized (key -> sum, count) view fed by
    foreachBatch partial aggregates.

    ``key_expr``/``value_col`` are column expressions evaluated on each
    micro-batch; the per-batch agg runs distributed and ships only
    group-cardinality rows to the fold. Pass ``journal_dir`` for
    restart-safe exactly-once (see module docstring).
    """

    def __init__(self, key_expr: str, value_col: str, journal_dir: str | None = None):
        self.key_expr = key_expr
        self.value_col = value_col
        if journal_dir and "://" in journal_dir:
            # the journal is DRIVER-LOCAL by design (module docstring):
            # os-level IO on a URI would mkdir a literal "hdfs:" dir
            # and journal into the void — refuse loudly instead
            raise ValueError(
                f"journal_dir must be a driver-local path, got URI "
                f"{journal_dir!r}; point it at a driver-mounted filesystem"
            )
        self.journal_dir = journal_dir
        self.view: dict = {}
        self.applied: set[int] = set()
        if journal_dir:
            self._replay_journal()

    def _replay_journal(self) -> None:
        os.makedirs(self.journal_dir, exist_ok=True)
        for fname in sorted(os.listdir(self.journal_dir)):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(self.journal_dir, fname), encoding="utf-8") as fh:
                rec = json.load(fh)
            if rec["batch_id"] in self.applied:  # duplicate journal entry
                continue
            self.applied.add(rec["batch_id"])
            for k, s, c in rec["partials"]:
                s0, c0 = self.view.get(k, (0.0, 0))
                self.view[k] = (s0 + s, c0 + c)

    def _journal(self, batch_id: int, partials: list[tuple]) -> None:
        rec = {"batch_id": batch_id, "partials": [[k, s, c] for k, s, c in partials]}
        tmp = os.path.join(self.journal_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(rec, fh)
            fh.flush()
            os.fsync(fh.fileno())
        # atomic commit: the batch is applied iff this rename landed
        os.replace(tmp, os.path.join(self.journal_dir, f"batch-{batch_id:012d}.json"))

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
        rows = [(r.k, float(r.s or 0.0), r.c) for r in partial]
        if self.journal_dir:
            self._journal(batch_id, rows)
        # mark BEFORE the in-memory fold: a same-process re-delivery
        # after this point must skip, and a cross-process restart
        # rebuilds from the journal anyway
        self.applied.add(batch_id)
        for k, s, c in rows:
            s0, c0 = self.view.get(k, (0.0, 0))
            self.view[k] = (s0 + s, c0 + c)

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
