"""Out-of-process queryable-state façade (reference
QueryClientHelper.java:104-139 parity: network lookup, miss ⇒ empty,
5 s timeout)."""

from __future__ import annotations

import json
import subprocess
import sys

from flink_ms_spark.serving.server import ModelStoreServer, query_model
from flink_ms_spark.serving.store import ModelStore


def _populated_store(spark) -> ModelStore:
    store = ModelStore(spark, "ALS_MODEL")
    batch = spark.createDataFrame(
        [("1-U", "1", "U", [1.0, 2.0]), ("7-I", "7", "I", [3.0, 4.0])],
        "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    store.upsert_batch(batch)
    return store


def test_lookup_hit_miss_same_process(spark):
    server = ModelStoreServer(_populated_store(spark)).start()
    try:
        hit = query_model(server.host, server.port, "1-U")
        assert hit["found"] and hit["factors"] == [1.0, 2.0]
        assert query_model(server.host, server.port, "99-U") is None  # miss
    finally:
        server.stop()


def test_lookup_from_subprocess(spark):
    """A DIFFERENT process can point-query the serving view — the
    reference's whole client module does exactly this (2 network hops);
    the 5 s client timeout is the default."""
    server = ModelStoreServer(_populated_store(spark)).start()
    code = (
        "import json, sys; from urllib.request import urlopen; "
        f"r = urlopen('http://{server.host}:{server.port}/lookup?key=7-I', timeout=5.0); "
        "print(json.dumps(json.loads(r.read())))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=30
        )
        assert out.returncode == 0, out.stderr
        payload = json.loads(out.stdout)
        assert payload["found"] is True
        assert payload["kind"] == "I"
        assert payload["factors"] == [3.0, 4.0]
    finally:
        server.stop()


def test_server_reflects_upserts(spark):
    """The façade serves the LIVE store: an upsert after start is
    visible to the next query (the reference's Kafka→state loop has
    the same read-your-writes-at-batch-boundary shape)."""
    store = _populated_store(spark)
    server = ModelStoreServer(store).start()
    try:
        assert query_model(server.host, server.port, "2-U") is None
        batch = store.spark.createDataFrame(
            [("2-U", "2", "U", [9.0])],
            "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
        )
        store.upsert_batch(batch)
        assert query_model(server.host, server.port, "2-U")["factors"] == [9.0]
    finally:
        server.stop()


def test_snapshot_rollback_serving(spark):
    """Versioned serving: upsert a new model, validate, roll back in
    O(1) — lookups and the join view flip atomically."""
    store = _populated_store(spark)
    v1 = store.snapshot()

    # "deploy" a regressed model for key 1-U and add a new key
    bad = spark.createDataFrame(
        [("1-U", "1", "U", [9.0, 9.0]), ("2-U", "2", "U", [5.0, 5.0])],
        "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    store.upsert_batch(bad)
    assert list(store.lookup("1-U").factors) == [9.0, 9.0]
    assert store.lookup("2-U") is not None
    v2 = store.snapshot()

    store.rollback(v1)
    assert list(store.lookup("1-U").factors) == [1.0, 2.0]  # restored
    assert store.lookup("2-U") is None  # new key gone with the rollback
    assert store.view().where("key = '2-U'").count() == 0

    store.rollback(v2)  # roll FORWARD works too
    assert list(store.lookup("1-U").factors) == [9.0, 9.0]

    import pytest as _pytest

    with _pytest.raises(KeyError):
        store.rollback(99)


def test_lookup_over_http_from_spilled_store(spark):
    """X2 façade against a SPILLED store (max_dict_keys exceeded): the
    HTTP lookup path goes store.lookup → DataFrame point filter instead
    of the dict, with identical hit/miss payloads — the network surface
    must not care which backend answers."""
    store = ModelStore(spark, "ALS_MODEL", max_dict_keys=1)
    batch = spark.createDataFrame(
        [("1-U", "1", "U", [1.0, 2.0]), ("7-I", "7", "I", [3.0, 4.0])],
        "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    store.upsert_batch(batch)
    assert store._spilled  # 2 keys > cap of 1
    server = ModelStoreServer(store).start()
    try:
        hit = query_model(server.host, server.port, "1-U")
        assert hit["found"] and hit["factors"] == [1.0, 2.0]
        assert query_model(server.host, server.port, "99-U") is None  # miss
    finally:
        server.stop()
