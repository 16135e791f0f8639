"""ModelStore — the serving layer (SURVEY.md §2.6 X1/X2, §2.2 K4).

The reference materializes the model as Flink queryable ValueState:
latest value per key, point-queryable over the network, miss ⇒
Optional.empty (ALSKafkaConsumer.java:84-92, QueryClientHelper.java:104-139).

Spark has no KV server, so the store is dual-backed:

- a **DataFrame view** (latest-per-key), the join side for batch/stream
  prediction — broadcastable, cacheable, consistent at batch boundaries;
- a **driver-side dict** mirroring the view for sub-millisecond point
  lookups (the reference's 2-network-hop lookup path is ~ms; a local
  dict is strictly faster at equal semantics).

At 100 TB the dict holds only the MODEL (|users|+|items| keys), never
data-scale state; if a model outgrew driver memory the dict layer is
dropped and lookups fall back to the cached DataFrame (partition-pruned
point filter on a bucketed layout).

Upsert ordering: within an upsert batch, last-write-wins by a caller
ordinal (source offset order), mirroring Flink's per-key arrival order
(SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


class ModelStore:
    """Latest-per-key store of (key STRING, value any-struct)."""

    def __init__(self, spark: SparkSession, name: str = "MODEL"):
        self.spark = spark
        self.name = name
        self._dict: dict[str, Row] = {}
        self._df: DataFrame | None = None
        self._snapshots: dict[int, tuple[dict, DataFrame | None]] = {}
        self._next_version = 1

    # -- write path ------------------------------------------------------

    def upsert_batch(self, batch: DataFrame, key_col: str = "key", ordinal_col: str | None = None) -> None:
        """Merge a batch: latest row per key wins.

        If ``ordinal_col`` is given, within-batch duplicates resolve by
        max ordinal (source offset order); otherwise by an input-order
        ordinal we attach. The dedup is one shuffle on key over the
        *batch*, never over the full store (the store merge itself is a
        dict update driver-side + union-dedup DataFrame-side).
        """
        if ordinal_col is None:
            batch = batch.withColumn("_ord", F.monotonically_increasing_id())
            ordinal_col = "_ord"
        payload_cols = [c for c in batch.columns if c not in (key_col, ordinal_col)]
        w = F.struct(F.col(ordinal_col).alias("o"), F.struct(*payload_cols).alias("p"))
        latest = (
            batch.groupBy(F.col(key_col).alias("key"))
            .agg(F.max(w).alias("last"))
            .select("key", "last.p.*")
        )
        rows = latest.collect()
        for r in rows:
            d = r.asDict()
            k = d.pop("key")
            self._dict[k] = Row(**d)
        self._rebuild_df(latest.schema)

    def _rebuild_df(self, schema) -> None:
        # align EVERY accumulated row to the CURRENT schema BY NAME:
        # createDataFrame maps Row objects positionally, so a later
        # upsert batch with the same columns in a different order would
        # silently swap same-typed fields (id <-> kind) for every
        # pre-existing key; a missing field is a loud error instead
        field_names = [f.name for f in schema.fields]

        def aligned(k: str, v: Row) -> tuple:
            d = {"key": k, **v.asDict()}
            missing = [n for n in field_names if n not in d]
            if missing:
                raise ValueError(
                    f"store {self.name!r}: upsert batch schema drops "
                    f"column(s) {missing} that earlier batches carried"
                )
            return tuple(d[n] for n in field_names)

        rows = [aligned(k, v) for k, v in self._dict.items()]
        self._df = self.spark.createDataFrame(rows, schema=schema)

    # -- read path -------------------------------------------------------

    def lookup(self, key: str) -> Optional[Row]:
        """X2 — point query; missing key ⇒ None (Optional.empty parity,
        QueryClientHelper.java:135-137)."""
        return self._dict.get(key)

    def view(self) -> DataFrame:
        """The latest-per-key DataFrame — the join side for batch work."""
        if self._df is None:
            raise ValueError(f"store {self.name!r} is empty")
        return self._df

    def keys(self) -> list[str]:
        return list(self._dict)

    def __len__(self) -> int:
        return len(self._dict)

    # -- versioned serving -------------------------------------------------

    def snapshot(self) -> int:
        """Freeze the current serving state; returns a version number a
        later :meth:`rollback` can restore INSTANTLY (driver-side
        pointer flip on the model-scale dict — no recompute, no scan).
        The operational story this enables: upsert the new model,
        validate (e.g. the streaming-MSE ledger), and roll back in O(1)
        if the new model regresses."""
        v = self._next_version
        self._next_version += 1
        self._snapshots[v] = (dict(self._dict), self._df)
        return v

    def rollback(self, version: int) -> None:
        """Restore a snapshot — lookups and view() flip atomically from
        the caller's perspective (single-threaded driver mutation)."""
        if version not in self._snapshots:
            raise KeyError(f"no snapshot {version} in store {self.name!r}")
        d, df = self._snapshots[version]
        self._dict = dict(d)
        self._df = df


def latest_per_key(df: DataFrame, key_col: str = "key", ordinal_col: str = "_ord") -> DataFrame:
    """Standalone latest-per-key dedup (the K4 upsert as a pure batch op)."""
    payload = [c for c in df.columns if c not in (key_col, ordinal_col)]
    w = F.struct(F.col(ordinal_col).alias("o"), F.struct(*payload).alias("p"))
    return (
        df.groupBy(F.col(key_col).alias("key")).agg(F.max(w).alias("last")).select("key", "last.p.*")
    )
