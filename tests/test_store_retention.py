"""Spilled-store generation lifecycle — retention GC, snapshot pinning,
restart recovery, and the loud-failure guards (VERDICT r8 task 4 +
ADVICE r8 items on serving/store.py).

Reference parity context: the reference's queryable state lives in
Flink's state backend with checkpoint-owned retention
(QueryClientHelper.java:104-139 reads it; Flink GCs old checkpoints).
Our parquet generations are the analogous persisted state, so they need
the analogous retention story: live view + held snapshots pin
generations, everything else is deleted.
"""

from __future__ import annotations

import os

import pytest

from flink_ms_spark.serving.store import ModelStore


def _gens(root: str) -> list[str]:
    return sorted(d for d in os.listdir(root) if d.startswith("gen-"))


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "key string, x double")


def test_generation_gc_bounds_disk_with_no_snapshots(spark, tmp_path):
    """N post-spill upserts with zero snapshots held leave exactly ONE
    generation on disk (the leak was O(view_size × n_upserts))."""
    root = str(tmp_path / "spill")
    store = ModelStore(spark, "GC", max_dict_keys=1, spill_buckets=4, spill_dir=root)
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    assert store._spilled
    for i in range(4):
        store.upsert_batch(_mk_batch(spark, [("a", float(i)), (f"k{i}", 0.5)]))
    assert _gens(root) == [os.path.basename(store._gen_dir)]
    assert store.lookup("a").x == 3.0
    assert store.lookup("k3").x == 0.5
    assert store.lookup("nope") is None


def test_snapshot_pins_generation_and_release_collects_it(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(spark, "PIN", max_dict_keys=1, spill_buckets=4, spill_dir=root)
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    v = store.snapshot()
    pinned = store._gen_dir
    store.upsert_batch(_mk_batch(spark, [("a", 9.0)]))
    # two generations live: the snapshot's and the current one
    assert set(_gens(root)) == {os.path.basename(pinned), os.path.basename(store._gen_dir)}
    # rollback still green while the snapshot is held
    store.rollback(v)
    assert store.lookup("a").x == 1.0
    # roll forward again by upserting, then release: the pinned gen goes away
    store.upsert_batch(_mk_batch(spark, [("a", 9.0)]))
    store.release_snapshot(v)
    assert _gens(root) == [os.path.basename(store._gen_dir)]
    assert store.lookup("a").x == 9.0
    with pytest.raises(KeyError):
        store.release_snapshot(v)


def test_expire_snapshots_drops_all_pins(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(spark, "EXP", max_dict_keys=1, spill_buckets=4, spill_dir=root)
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    for i in range(3):
        store.snapshot()
        store.upsert_batch(_mk_batch(spark, [("a", float(i))]))
    assert len(_gens(root)) == 4
    store.expire_snapshots()
    assert _gens(root) == [os.path.basename(store._gen_dir)]
    assert store.lookup("a").x == 2.0


def test_restart_recovery_reattaches_and_never_clobbers(spark, tmp_path):
    """ADVICE r8 (medium): a new ModelStore pointed at a used spill_dir
    must resume from the persisted generation, not overwrite it."""
    root = str(tmp_path / "spill")
    first = ModelStore(spark, "REC", max_dict_keys=1, spill_buckets=8, spill_dir=root)
    first.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0)]))
    assert first._spilled
    old_gen = first._gen
    del first

    # constructor passes a DIFFERENT bucket count: the generation's
    # metadata wins, so bucket pruning still matches the written layout
    second = ModelStore(spark, "REC", spill_buckets=2, spill_dir=root)
    assert second._spilled
    assert second.spill_buckets == 8
    assert second.lookup("b").x == 2.0
    assert second.lookup("zz") is None
    assert sorted(second.keys()) == ["a", "b", "c"]
    # a post-recovery upsert writes a NEW generation past the old one
    second.upsert_batch(_mk_batch(spark, [("b", 20.0)]))
    assert second._gen > old_gen
    assert second.lookup("b").x == 20.0
    assert second.lookup("a").x == 1.0


def test_recovery_on_fresh_dir_is_a_normal_empty_store(spark, tmp_path):
    root = str(tmp_path / "fresh")
    os.makedirs(root)
    store = ModelStore(spark, "FRESH", max_dict_keys=10, spill_dir=root)
    assert not store._spilled and len(store) == 0
    store.upsert_batch(_mk_batch(spark, [("a", 1.0)]))
    assert store.lookup("a").x == 1.0


def test_reserved_column_rejected_before_any_mutation(spark):
    """ADVICE r8: the spill_bucket reserved-name guard fires on the
    FIRST offending batch, before state mutates — not at spill time."""
    store = ModelStore(spark, "GUARD", max_dict_keys=100)
    store.upsert_batch(_mk_batch(spark, [("a", 1.0)]))
    bad = spark.createDataFrame([("b", 2.0, 0)], "key string, x double, spill_bucket int")
    with pytest.raises(ValueError, match="spill_bucket"):
        store.upsert_batch(bad)
    # nothing mutated: the offending batch left no trace
    assert len(store) == 1 and store.lookup("b") is None


def test_duplicate_key_generation_fails_loud(spark, tmp_path):
    """ADVICE r8: an externally-written generation with duplicate keys
    must raise, not silently serve an arbitrary row."""
    root = str(tmp_path / "spill")
    gen = os.path.join(root, "gen-1")
    from pyspark.sql import functions as F

    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "key string, x double"
    ).withColumn(
        "spill_bucket",
        F.pmod(F.crc32(F.encode(F.col("key"), "UTF-8")), F.lit(4)).cast("int"),
    )
    dup.repartition(1).write.partitionBy("spill_bucket").parquet(gen)
    import json

    with open(os.path.join(gen, "_store_meta.json"), "w") as fh:
        json.dump({"buckets": 4, "cols": ["key", "x"]}, fh)

    store = ModelStore(spark, "DUP", spill_dir=root)
    assert store._spilled
    assert store.lookup("b").x == 3.0  # unique keys still serve
    with pytest.raises(ValueError, match="expected exactly 1"):
        store.lookup("a")


def test_streaming_loop_snapshot_validate_release_bounds_disk(spark, tmp_path):
    """The operational serving loop the GC enables, end-to-end through
    the STREAMING loader (K4/X1): each incremental model drop is
    upserted via stream_model_into_store, snapshotted, validated by
    point lookup, and released — disk stays at one generation across
    the whole run, and a deliberately-held snapshot still rolls back."""
    from flink_ms_spark.streaming.loader import stream_model_into_store

    src = tmp_path / "model_in"
    src.mkdir()
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "ALS_MODEL", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )

    def drop(fname: str, lines: list[str]) -> None:
        (src / fname).write_text("\n".join(lines) + "\n")
        q = stream_model_into_store(
            spark, str(src), store, str(tmp_path / "ckpt"), available_now=True
        )
        q.awaitTermination(120)

    drop("a.txt", ["1,U,1.0;2.0", "2,U,3.0;4.0"])  # spills (2 > cap 1)
    assert store._spilled
    held = store.snapshot()  # pin the v1 model for rollback
    for i, fname in enumerate(("b.txt", "c.txt", "d.txt")):
        drop(fname, [f"1,U,{i + 10}.0;0.0"])
        v = store.snapshot()
        assert list(store.lookup("1-U").factors) == [float(i + 10), 0.0]
        store.release_snapshot(v)  # validated → un-pin
    # one generation for the live view + one pinned by the held snapshot
    assert len(_gens(root)) == 2
    store.rollback(held)
    assert list(store.lookup("1-U").factors) == [1.0, 2.0]
    store.release_snapshot(held)


def test_recovery_skips_incomplete_newest_generation(spark, tmp_path):
    """A crash mid-write leaves a gen-N with no _SUCCESS: recovery
    attaches the newest COMPLETE generation but still resumes the
    counter past the dead one, and the next write GCs the debris."""
    root = str(tmp_path / "spill")
    first = ModelStore(spark, "REC2", max_dict_keys=1, spill_buckets=4, spill_dir=root)
    first.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    live = first._gen
    dead = os.path.join(root, f"gen-{live + 1}")
    os.makedirs(dead)  # simulated crashed write: directory, no _SUCCESS
    with open(os.path.join(dead, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn write")
    del first

    second = ModelStore(spark, "REC2", spill_dir=root)
    assert second._spilled and second._gen == live + 1
    assert second.lookup("a").x == 1.0
    second.upsert_batch(_mk_batch(spark, [("a", 5.0)]))
    assert second._gen == live + 2
    assert second.lookup("a").x == 5.0
    # GC removed both the superseded live gen and the torn one
    assert _gens(root) == [f"gen-{live + 2}"]


def test_lookup_spark_fallback_when_arrow_cannot_read(spark, tmp_path):
    """A generation pyarrow can't open (e.g. hdfs:// without libhdfs)
    caches a known-bad verdict and every lookup serves through the
    partition-pruned Spark filter with identical rows."""
    root = str(tmp_path / "spill")
    store = ModelStore(spark, "FB", max_dict_keys=1, spill_buckets=4, spill_dir=root)
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    assert store._spilled
    via_arrow = store.lookup("a")
    store._arrow_cache = {store._gen_dir: False}  # simulate unreadable
    assert store.lookup("a") == via_arrow
    assert store.lookup("b").x == 2.0
    assert store.lookup("zz") is None
    assert store._arrow_cache == {store._gen_dir: False}  # no re-probe


def test_recovery_treats_meta_less_generation_as_debris(spark, tmp_path):
    """ADVICE r9 (medium): _store_meta.json is written AFTER the Spark
    parquet commit, so a crash in that window leaves a _SUCCESS'd gen
    with no meta. Attaching it with the constructor's bucket count
    would silently break bucket-pruned lookups whenever the counts
    differ — recovery must skip it (newest COMPLETE gen wins) and the
    next write must GC the debris."""
    root = str(tmp_path / "spill")
    first = ModelStore(spark, "REC3", max_dict_keys=1, spill_buckets=8, spill_dir=root)
    first.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    live = first._gen
    del first

    # simulated crash between parquet commit and meta write: a real
    # Spark write (has _SUCCESS) whose _store_meta.json never landed
    dead = os.path.join(root, f"gen-{live + 1}")
    spark.createDataFrame([("x", 9.0)], "key string, x double").withColumn(
        "spill_bucket", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0)
    ).write.partitionBy("spill_bucket").parquet(dead)
    assert os.path.exists(os.path.join(dead, "_SUCCESS"))

    second = ModelStore(spark, "REC3", spill_buckets=2, spill_dir=root)
    assert second._spilled
    assert second.spill_buckets == 8  # the COMPLETE gen's meta wins
    assert second._gen == live + 1  # counter resumed past the debris
    assert second.lookup("a").x == 1.0 and second.lookup("x") is None
    second.upsert_batch(_mk_batch(spark, [("c", 3.0)]))
    assert second.lookup("c").x == 3.0
    assert _gens(root) == [f"gen-{live + 2}"]  # debris GC'd with the old gen
