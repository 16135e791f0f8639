"""CDC tombstone deletes on the ModelStore + apply_cdc_batch — the
serving-side twin of the cdc_upsert_merge catalog query. The
reference's ValueState surface is upsert-only
(ALSKafkaConsumer.java:85-92); deletes are engine-side widening that
the round-10 manifest layout makes cheap: a delete rewrites only the
buckets its keys hash into, exactly like an upsert.
"""

from __future__ import annotations

import os

from flink_ms_spark.serving.store import ModelStore, apply_cdc_batch


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "key string, x double")


def _leaf_stats(root: str) -> dict[str, tuple]:
    stats = {}
    for d in os.listdir(root):
        if d.startswith("data-") and os.path.isdir(os.path.join(root, d)):
            for leaf in os.listdir(os.path.join(root, d)):
                if not leaf.startswith("spill_bucket="):
                    continue
                for f in os.listdir(os.path.join(root, d, leaf)):
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(root, d, leaf, f))
                        stats[f"{d}/{leaf}/{f}"] = (
                            st.st_ino, st.st_mtime_ns, st.st_size,
                        )
    return stats


def test_delete_in_memory(spark):
    store = ModelStore(spark, "DEL_MEM")
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0)]))
    assert store.delete_keys(["b", "nope"]) == 1
    assert store.lookup("b") is None
    assert store.lookup("a").x == 1.0
    assert len(store) == 2
    assert store.view().count() == 2  # the DataFrame view dropped it too
    assert store.delete_keys([]) == 0
    assert store.delete_keys(["b"]) == 0  # already gone


def test_delete_spilled_rewrites_only_touched_buckets(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_SPILL", max_dict_keys=1, spill_buckets=8, spill_dir=root
    )
    store.upsert_batch(_mk_batch(spark, [(f"k{i}", float(i)) for i in range(64)]))
    assert store._spilled
    before = _leaf_stats(root)
    b7 = store._bucket_of("k7")
    untouched_before = {
        p: s for p, s in before.items() if f"spill_bucket={b7}" not in p
    }
    assert untouched_before

    assert store.delete_keys(["k7"]) == 1

    after = _leaf_stats(root)
    untouched_after = {
        p: s for p, s in after.items() if f"spill_bucket={b7}" not in p
    }
    # untouched buckets: same files, byte-identical — never rewritten
    assert untouched_after == untouched_before
    assert store.lookup("k7") is None
    for i in (0, 1, 13, 63):
        if i != 7:
            assert store.lookup(f"k{i}").x == float(i)
    assert len(store) == 63


def test_delete_missing_keys_leaves_manifest_untouched(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_MISS", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0)]))
    gen_before = store._manifest_no
    assert store.delete_keys(["ghost1", "ghost2"]) == 0
    assert store._manifest_no == gen_before  # no generation churn
    assert store.lookup("a").x == 1.0


def test_delete_emptied_bucket_absent_from_manifest(spark, tmp_path):
    """A bucket whose every key is deleted disappears from the manifest
    — absence IS the tombstone, and lookups in it miss by construction
    (no leaf read at all)."""
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_EMPTY", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )
    store.upsert_batch(_mk_batch(spark, [(f"k{i}", float(i)) for i in range(16)]))
    b0_keys = [f"k{i}" for i in range(16) if store._bucket_of(f"k{i}") == 0]
    assert b0_keys  # 16 keys over 4 buckets: bucket 0 is populated
    assert store.delete_keys(b0_keys) == len(b0_keys)
    assert 0 not in store._manifest
    for k in b0_keys:
        assert store.lookup(k) is None
    assert len(store) == 16 - len(b0_keys)


def test_delete_everything_keeps_typed_empty_view_and_recovers(spark, tmp_path):
    """Deleting every key yields an EMPTY manifest whose generation
    still records the leaf schema — the live view stays typed, and a
    restarted process re-attaches to the empty store instead of
    failing on a zero-leaf scan."""
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_ALL", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )
    keys = [f"k{i}" for i in range(8)]
    store.upsert_batch(_mk_batch(spark, [(k, 1.0) for k in keys]))
    assert store.delete_keys(keys) == 8
    assert store._manifest == {}
    assert len(store) == 0
    assert store.view().columns == ["key", "x"]  # typed, empty
    assert store.lookup("k0") is None

    recovered = ModelStore(spark, "DEL_ALL2", spill_dir=root)
    assert recovered._spilled
    assert len(recovered) == 0
    assert recovered.lookup("k0") is None
    # and the empty store accepts new life
    recovered.upsert_batch(_mk_batch(spark, [("fresh", 9.0)]))
    assert recovered.lookup("fresh").x == 9.0


def test_delete_evicts_hot_tier(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_HOT", max_dict_keys=1, spill_buckets=4,
        spill_dir=root, hot_cache_keys=64,
    )
    store.upsert_batch(_mk_batch(spark, [(f"k{i}", float(i)) for i in range(16)]))
    assert store.lookup("k3").x == 3.0  # now cached hot
    assert "k3" in store._hot
    store.delete_keys(["k3"])
    assert store.lookup("k3") is None  # not served stale from the tier


def test_snapshot_pins_deleted_keys_and_rollback_restores(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "DEL_SNAP", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )
    store.upsert_batch(_mk_batch(spark, [(f"k{i}", float(i)) for i in range(8)]))
    v = store.snapshot()
    store.delete_keys(["k2", "k5"])
    assert store.lookup("k2") is None
    store.rollback(v)
    assert store.lookup("k2").x == 2.0
    assert store.lookup("k5").x == 5.0
    assert len(store) == 8


def test_apply_cdc_batch_mixed_feed(spark):
    """Latest op per key wins within a batch; tombstones delete, the
    op column is never stored."""
    store = ModelStore(spark, "CDC_MEM")
    store.upsert_batch(_mk_batch(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0)]))
    feed = spark.createDataFrame(
        [
            ("a", "U", 10.0, 1),   # update a
            ("b", "D", 0.0, 2),    # delete b ...
            ("b", "U", 20.0, 3),   # ... then re-upsert: latest wins
            ("c", "U", 30.0, 4),   # update c ...
            ("c", "D", 0.0, 5),    # ... then delete: latest wins
            ("d", "U", 4.0, 6),    # insert d
            ("e", "D", 0.0, 7),    # tombstone for a key never present
        ],
        "key string, op string, x double, off long",
    )
    n_up, n_del = apply_cdc_batch(store, feed, ordinal_col="off")
    assert n_up == 3           # a, b, d
    assert n_del == 1          # c existed; e did not
    assert store.lookup("a").x == 10.0
    assert store.lookup("b").x == 20.0
    assert store.lookup("c") is None
    assert store.lookup("d").x == 4.0
    assert store.lookup("e") is None
    # the op column never lands in the stored payload
    assert store.view().columns == ["key", "x"]


def test_apply_cdc_batch_spilled(spark, tmp_path):
    root = str(tmp_path / "spill")
    store = ModelStore(
        spark, "CDC_SPILL", max_dict_keys=1, spill_buckets=4, spill_dir=root
    )
    store.upsert_batch(_mk_batch(spark, [(f"k{i}", float(i)) for i in range(12)]))
    assert store._spilled
    feed = spark.createDataFrame(
        [("k1", "U", 100.0, 1), ("k2", "D", 0.0, 2), ("new", "U", 7.0, 3)],
        "key string, op string, x double, off long",
    )
    n_up, n_del = apply_cdc_batch(store, feed, ordinal_col="off")
    assert (n_up, n_del) == (2, 1)
    assert store.lookup("k1").x == 100.0
    assert store.lookup("k2") is None
    assert store.lookup("new").x == 7.0
    assert len(store) == 12  # 12 - 1 deleted + 1 inserted

def test_stream_cdc_into_store(spark, tmp_path):
    """End-to-end: a file change-feed (key,OP,x lines) drained with
    availableNow applies upserts AND tombstones; a second drain from
    the same checkpoint is incremental."""
    from flink_ms_spark.streaming.loader import stream_cdc_into_store

    src = tmp_path / "cdc_in"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    (src / "a.txt").write_text("a,U,1.0\nb,U,2.0\nc,U,3.0\nb,D,0\n")
    store = ModelStore(spark, "CDC_STREAM")
    q = stream_cdc_into_store(spark, str(src), store, str(ckpt))
    q.awaitTermination(120)
    assert store.lookup("a").x == 1.0
    assert store.lookup("b") is None  # tombstoned within the batch
    assert store.lookup("c").x == 3.0
    assert len(store) == 2

    (src / "b.txt").write_text("c,D,0\nd,U,4.0\n")
    q2 = stream_cdc_into_store(spark, str(src), store, str(ckpt))
    q2.awaitTermination(120)
    assert store.lookup("c") is None
    assert store.lookup("d").x == 4.0
    assert len(store) == 2  # a, d


def test_apply_cdc_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once absorption: re-applying the SAME mixed feed (the
    replay a crashed-before-checkpoint micro-batch produces) leaves
    the spilled store byte-for-byte in the same logical state —
    upserts are latest-wins overwrites of identical rows, tombstone
    re-deletes hit nothing (n_del 0 second time)."""
    from flink_ms_spark.serving.store import ModelStore, apply_cdc_batch

    store = ModelStore(
        spark, "CDC_REPLAY", max_dict_keys=4,
        spill_dir=str(tmp_path / "spill"), spill_buckets=8,
    )
    seed = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(10)], "key string, x double"
    )
    store.upsert_batch(seed)
    assert store._spilled
    feed = spark.createDataFrame(
        [("k1", "U", 100.0), ("k2", "D", 0.0), ("new", "U", 7.0)],
        "key string, op string, x double",
    )
    n_up1, n_del1 = apply_cdc_batch(store, feed, op_col="op", delete_op="D")
    state1 = {k: store.lookup(k) for k in store.keys()}
    n_up2, n_del2 = apply_cdc_batch(store, feed, op_col="op", delete_op="D")
    state2 = {k: store.lookup(k) for k in store.keys()}
    assert (n_up1, n_del1) == (2, 1)
    assert (n_up2, n_del2) == (2, 0)  # re-delete of a gone key is a no-op
    assert state1 == state2
    assert store.lookup("k2") is None
