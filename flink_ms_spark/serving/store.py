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
data-scale state; if a model outgrows driver memory the dict layer is
dropped and lookups fall back to the cached DataFrame. That fallback
is REAL, not a docstring: construct with ``max_dict_keys=N`` and the
store SPILLS when the key count first exceeds N — the dict is cleared,
the view is pinned executor-side (localCheckpoint), later upserts
merge distributively (anti-join + union on key, one keyed shuffle over
store+batch, lineage re-pinned each merge so plans stay O(1) deep),
and :meth:`lookup` becomes a point filter on the pinned view. Same
semantics, µs→ms latency class — the documented price of exceeding
driver memory (still the reference's own 2-network-hop latency class,
QueryClientHelper.java:104-139).

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

    def __init__(
        self,
        spark: SparkSession,
        name: str = "MODEL",
        max_dict_keys: int | None = None,
    ):
        self.spark = spark
        self.name = name
        self.max_dict_keys = max_dict_keys
        self._spilled = False
        self._dict: dict[str, Row] = {}
        self._df: DataFrame | None = None
        self._snapshots: dict[int, tuple[dict, DataFrame | None, bool]] = {}
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
        if self._spilled:
            self._merge_spilled(latest)
            return
        rows = latest.collect()
        for r in rows:
            d = r.asDict()
            k = d.pop("key")
            self._dict[k] = Row(**d)
        self._rebuild_df(latest.schema)
        if self.max_dict_keys is not None and len(self._dict) > self.max_dict_keys:
            self._spill()

    def _spill(self) -> None:
        """Key count exceeded ``max_dict_keys``: drop the dict layer.
        The just-rebuilt view already holds every key; pin it
        executor-side so point filters don't recompute lineage.

        Fault-tolerance tradeoff: localCheckpoint truncates lineage, so
        an executor loss can invalidate the pinned blocks. For a
        serving store that is the right default (the upsert source —
        the model stream/table — replays; a lost view rebuilds), but a
        cluster deployment that cannot tolerate a rebuild window should
        persist the view to a parquet table per upsert instead."""
        self._df = self._df.localCheckpoint(eager=True)
        self._dict = {}
        self._spilled = True

    def _merge_spilled(self, latest: DataFrame) -> None:
        # same loud schema-drift guard as the dict path's _rebuild_df —
        # BOTH directions: a batch that DROPS a column would lose data
        # for old rows, and a batch that ADDS one would otherwise die
        # inside unionByName with an opaque AnalysisException
        dropped = [c for c in self._df.columns if c not in latest.columns]
        if dropped:
            raise ValueError(
                f"store {self.name!r}: upsert batch schema drops "
                f"column(s) {dropped} that earlier batches carried"
            )
        added = [c for c in latest.columns if c not in self._df.columns]
        if added:
            raise ValueError(
                f"store {self.name!r}: upsert batch schema adds "
                f"column(s) {added} that earlier batches lack"
            )
        # latest-per-key merge: keep old rows whose key is NOT in the
        # batch, add the batch's winners — one keyed shuffle over
        # store + batch; re-pin so the plan stays O(1) deep however
        # many upserts accumulate
        merged = self._df.join(
            latest.select("key"), "key", "left_anti"
        ).unionByName(latest)
        self._df = merged.localCheckpoint(eager=True)

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
        QueryClientHelper.java:135-137). Spilled stores answer from a
        point filter on the pinned view — identical payload Rows, the
        ms-class latency the reference's network lookup already pays."""
        if not self._spilled:
            return self._dict.get(key)
        rows = self._df.where(F.col("key") == key).limit(1).collect()
        if not rows:
            return None
        d = rows[0].asDict()
        d.pop("key")
        return Row(**d)

    def view(self) -> DataFrame:
        """The latest-per-key DataFrame — the join side for batch work."""
        if self._df is None:
            raise ValueError(f"store {self.name!r} is empty")
        return self._df

    def keys(self) -> list[str]:
        """Model-scale by contract — collects from the view when
        spilled (tests/ops introspection, not a data-scale path)."""
        if self._spilled:
            return [r.key for r in self._df.select("key").collect()]
        return list(self._dict)

    def __len__(self) -> int:
        if self._spilled:
            return self._df.count()
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
        self._snapshots[v] = (dict(self._dict), self._df, self._spilled)
        return v

    def rollback(self, version: int) -> None:
        """Restore a snapshot — lookups and view() flip atomically from
        the caller's perspective (single-threaded driver mutation).
        Restores the backend mode too: rolling back to a pre-spill
        snapshot returns the store to dict-backed lookups."""
        if version not in self._snapshots:
            raise KeyError(f"no snapshot {version} in store {self.name!r}")
        d, df, spilled = self._snapshots[version]
        self._dict = dict(d)
        self._df = df
        self._spilled = spilled


def latest_per_key(df: DataFrame, key_col: str = "key", ordinal_col: str = "_ord") -> DataFrame:
    """Standalone latest-per-key dedup (the K4 upsert as a pure batch op)."""
    payload = [c for c in df.columns if c not in (key_col, ordinal_col)]
    w = F.struct(F.col(ordinal_col).alias("o"), F.struct(*payload).alias("p"))
    return (
        df.groupBy(F.col(key_col).alias("key")).agg(F.max(w).alias("last")).select("key", "last.p.*")
    )
