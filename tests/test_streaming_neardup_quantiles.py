"""Streaming incremental LSH near-dup + log-histogram quantiles."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_ms_spark.streaming.neardup import StreamingNearDup, band_signatures
from flink_ms_spark.streaming.quantiles import StreamingQuantiles, bin_counts

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_docs(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"part{len(list(path.iterdir()))}.json"
    f.write_text("\n".join(json.dumps(r) for r in rows))


def test_streaming_neardup_drops_cross_batch_duplicates(spark, tmp_path):
    src = tmp_path / "docs_in"
    reg = tmp_path / "registry"
    ckpt = tmp_path / "ckpt_nd"

    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely different content about spark partition shuffles here"
    _write_docs(src, [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},          # within-batch dup of 1
        {"doc_id": 3, "text": uniq},
    ])

    # driver-side collect must be an EXPLICIT opt-in (ADVICE r6):
    # running with neither out_dir nor debug_keep raises before the
    # stream starts
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    with pytest.raises(ValueError, match="survivor sink"):
        StreamingNearDup(str(reg)).run(stream, str(ckpt))

    nd = StreamingNearDup(str(reg), debug_keep=True)
    q = nd.run(stream, str(ckpt))
    q.awaitTermination(120)

    kept1 = sorted(r.doc_id for r in nd.kept)
    assert kept1 == [1, 3]  # min-id keeper survives, dup dropped

    # second batch: near-dup of batch-1 content + one new doc
    _write_docs(src, [
        {"doc_id": 10, "text": base},          # dup of registered doc 1
        {"doc_id": 11, "text": "fresh novel text with no earlier overlap at all"},
    ])
    nd.kept.clear()
    q = nd.run(stream, str(ckpt))
    q.awaitTermination(120)
    kept2 = sorted(r.doc_id for r in nd.kept)
    assert kept2 == [11]  # cross-batch dup suppressed by the registry


def test_streaming_neardup_parquet_survivor_sink(spark, tmp_path):
    """With ``out_dir`` set, survivors land in ``out_dir/batch_id=N``
    parquet inside each batch and NEVER cross the driver (``kept``
    stays empty) — survivors are the non-duplicates, i.e. nearly the
    whole stream, so a driver collect is an unbounded memory sink at
    ingest scale. Replaying a batch_id rewrites its own partition
    (idempotent, like the registry write)."""
    src = tmp_path / "docs_in_sink"
    reg = tmp_path / "registry_sink"
    out = tmp_path / "survivors"
    ckpt = tmp_path / "ckpt_sink"

    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely different content about spark partition shuffles here"
    _write_docs(src, [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},          # within-batch dup of 1
        {"doc_id": 3, "text": uniq},
    ])

    nd = StreamingNearDup(str(reg), out_dir=str(out))
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    nd.run(stream, str(ckpt)).awaitTermination(120)

    assert nd.kept == []  # no driver-side accumulation
    batch0 = out / "batch_id=0"
    assert batch0.is_dir()
    got0 = sorted(r.doc_id for r in spark.read.parquet(str(batch0)).collect())
    assert got0 == [1, 3]

    # second micro-batch appends its own partition; registry suppresses
    # the cross-batch dup
    _write_docs(src, [
        {"doc_id": 10, "text": base},          # dup of registered doc 1
        {"doc_id": 11, "text": "fresh novel text with no earlier overlap at all"},
    ])
    nd.run(stream, str(ckpt)).awaitTermination(120)
    assert nd.kept == []
    all_ids = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert all_ids == [1, 3, 11]

    # replay batch 0 (foreachBatch redelivery after a failure): the
    # partition is REWRITTEN, not appended — corpus stays [1, 3, 11]
    replay = spark.createDataFrame(
        [(1, base), (2, base), (3, uniq)], DOC_SCHEMA
    )
    nd._sink(replay, batch_id=0)
    assert nd.kept == []
    after = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert after == [1, 3, 11]

    # opt-in debug collect still works for small/test jobs
    nd_dbg = StreamingNearDup(
        str(tmp_path / "reg_dbg"), out_dir=str(tmp_path / "out_dbg"),
        debug_keep=True,
    )
    nd_dbg._sink(replay, batch_id=0)
    assert sorted(r.doc_id for r in nd_dbg.kept) == [1, 3]


def test_streaming_neardup_batch_replay_is_idempotent(spark, tmp_path):
    reg = tmp_path / "registry2"
    nd = StreamingNearDup(str(reg))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], DOC_SCHEMA
    )
    first = {r.doc_id for r in nd.process_batch(docs, batch_id=0).collect()}
    # replay of the SAME batch id must not self-collide with its own
    # registry rows (exactly-once under foreachBatch replay)
    again = {r.doc_id for r in nd.process_batch(docs, batch_id=0).collect()}
    assert first == again == {1}


def test_within_batch_collision_chain_uses_cc_min_id(spark, tmp_path, monkeypatch):
    """Chain A<D<E with D~E and E~A (but no D~A bucket): connected-
    component min-id keeps only A. A per-bucket-keeper rule would also
    keep D — the round-2 advisory divergence."""
    import flink_ms_spark.streaming.neardup as nd_mod

    crafted = spark.createDataFrame(
        [(1, 0, "sigX"), (5, 0, "sigX"),   # E=5 collides with A=1
         (3, 1, "sigY"), (5, 1, "sigY")],  # D=3 collides with E only
        "doc_id LONG, band INT, band_sig STRING",
    )
    monkeypatch.setattr(nd_mod, "band_signatures", lambda df, **kw: crafted)
    nd = nd_mod.StreamingNearDup(str(tmp_path / "reg_chain"))
    docs = spark.createDataFrame([(1, "a"), (3, "d"), (5, "e")], DOC_SCHEMA)
    kept = {r.doc_id for r in nd.process_batch(docs, 0).collect()}
    assert kept == {1}


def test_registry_compaction_preserves_decisions(spark, tmp_path):
    from flink_ms_spark.streaming.neardup import StreamingNearDup, compact_registry

    reg = str(tmp_path / "reg_c")
    nd = StreamingNearDup(reg)
    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely different content about spark partition shuffles here"
    # duplicate-heavy batches: every batch re-offers the base text
    nd.process_batch(
        spark.createDataFrame([(1, base), (2, uniq)], DOC_SCHEMA), 0
    ).collect()
    for b in range(1, 4):
        nd.process_batch(
            spark.createDataFrame(
                [(10 * b, base), (10 * b + 1, f"novel text number {b} " * 5)],
                DOC_SCHEMA,
            ),
            b,
        ).collect()

    before = spark.read.parquet(reg).count()
    stats = compact_registry(spark, reg, target_files=1)
    # rows are already one-per-registered-band (survivor buckets are
    # disjoint by construction); the growth hazard is the per-batch
    # partition layout, which must collapse
    assert stats["rows_before"] == before == stats["rows_after"]
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1

    # decisions identical after compaction: a REPLAY of batch 1 keeps
    # exactly its original survivor (its own rows do not self-collide),
    # and a new batch still drops dups of registered content
    replay = {
        r.doc_id
        for r in nd.process_batch(
            spark.createDataFrame(
                [(10, base), (11, "novel text number 1 " * 5)], DOC_SCHEMA
            ),
            1,
        ).collect()
    }
    assert replay == {11}
    kept = {
        r.doc_id
        for r in nd.process_batch(
            spark.createDataFrame(
                [(100, base), (101, "entirely fresh closing content here")],
                DOC_SCHEMA,
            ),
            99,
        ).collect()
    }
    assert kept == {101}


def test_band_signatures_match_batch_minhash_math(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
        DOC_SCHEMA,
    )
    b = band_signatures(docs).collect()
    by_doc = {}
    for r in b:
        by_doc.setdefault(r.doc_id, {})[r.band] = r.band_sig
    assert by_doc[1] == by_doc[2]  # identical text ⇒ identical bands
    assert by_doc[1] != by_doc[3]


def test_quantile_sketch_relative_error_bound(spark, tmp_path):
    rng = np.random.default_rng(7)
    vals = np.abs(rng.lognormal(mean=2.0, sigma=1.0, size=20_000)) + 0.001
    df = spark.createDataFrame([(float(v),) for v in vals], ["value"])

    sk = StreamingQuantiles(growth=1.2)
    # fold as three "micro-batches" + one merged shard
    parts = np.array_split(vals, 3)
    for i, p in enumerate(parts[:2]):
        sk.update(spark.createDataFrame([(float(v),) for v in p], ["value"]), i)
    shard = StreamingQuantiles(growth=1.2)
    shard.update(spark.createDataFrame([(float(v),) for v in parts[2]], ["value"]))
    sk.merge(shard)

    assert sk.count == len(vals)
    for q in (0.5, 0.95, 0.99):
        est = sk.quantile(q)
        exact = float(np.quantile(vals, q))
        assert abs(est - exact) / exact <= 0.2 + 1e-9  # growth − 1 bound


def test_quantile_sketch_streaming_run(spark, tmp_path):
    src = tmp_path / "vals_in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"value": float(v)}) for v in range(1, 101))
    )
    schema = T.StructType([T.StructField("value", T.DoubleType())])
    state = str(tmp_path / "q_state")
    ckpt = str(tmp_path / "ckpt_q")
    sk = StreamingQuantiles(growth=1.1, state_path=state, spark=spark)
    stream = spark.readStream.schema(schema).json(str(src))
    q = sk.run(stream, ckpt)
    q.awaitTermination(120)
    assert sk.count == 100
    est = sk.quantile(0.5)
    assert abs(est - 50.0) / 50.0 <= 0.1 + 1e-9

    # RESTART: a fresh instance rebuilds bins from the persisted
    # per-batch summaries, so the checkpoint skipping batch 0 does not
    # truncate the sketch (the round-2 advisory finding).
    (src / "b.json").write_text(
        "\n".join(json.dumps({"value": float(v)}) for v in range(101, 201))
    )
    sk2 = StreamingQuantiles(growth=1.1, state_path=state, spark=spark)
    assert sk2.count == 100  # recovered without replaying batch 0
    q = sk2.run(spark.readStream.schema(schema).json(str(src)), ckpt)
    q.awaitTermination(120)
    assert sk2.count == 200
    est = sk2.quantile(0.5)
    assert abs(est - 100.0) / 100.0 <= 0.1 + 1e-9


def test_quantile_sketch_refuses_checkpoint_without_state(spark, tmp_path):
    """Driver-lifetime sketches must not pair with a checkpoint — the
    restart would silently skip committed batches into empty bins."""
    schema = T.StructType([T.StructField("value", T.DoubleType())])
    src = tmp_path / "vals_nockpt"
    src.mkdir()
    sk = StreamingQuantiles()
    stream = spark.readStream.schema(schema).json(str(src))
    with pytest.raises(ValueError, match="state_path"):
        sk.run(stream, str(tmp_path / "ckpt_bad"))


def test_bin_counts_is_single_keyed_agg(spark):
    df = spark.range(1000).select((F.col("id") + 1).cast("double").alias("value"))
    plan = bin_counts(df, "value")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one shuffle, keyed on bin


def test_drift_monitor_flags_distribution_shift(spark, tmp_path):
    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import (
        StreamingDriftMonitor,
        bucket_profile,
        kl_bits,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    baseline = bucket_profile(docs)

    # in-distribution batch: a slice of the same corpus → tiny KL
    in_dist = docs.limit(20).select("text")
    # drifted batch: a single repeated alien token → concentrated mass
    drifted = spark.createDataFrame(
        [("zzgarbledtoken " * 50,)] * 20, ["text"]
    )
    kl_in = kl_bits(bucket_profile(in_dist), baseline)
    kl_out = kl_bits(bucket_profile(drifted), baseline)
    assert kl_out > kl_in
    assert kl_out > 1.0  # concentrated alien mass is unambiguous

    # streaming form
    src = tmp_path / "drift_in"
    _write_docs(src, [{"doc_id": 1, "text": "zzgarbledtoken " * 50}])
    mon = StreamingDriftMonitor(baseline, threshold_bits=0.5)
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    q = mon.run(stream, str(tmp_path / "ckpt_drift"))
    q.awaitTermination(120)
    assert len(mon.scores) == 1 and mon.scores[0][3] is True


def test_streaming_ingest_quality_gate(spark, tmp_path):
    """Optional model-based quality gate inside the ingest pipeline:
    prose passes, long-word no-stopword gibberish is dropped before
    the registry/write stages."""
    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import bucket_profile
    from flink_ms_spark.streaming.ingest import StreamingIngest

    baseline = bucket_profile(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = tmp_path / "qgate_in"
    _write_docs(src, [
        {"doc_id": 1, "source": "ok",
         "text": "the cat sat on the mat and it is a good day to walk in the park"},
        {"doc_id": 2, "source": "ok",
         "text": "zxqvwkjhsdfpo mnbpoiuylkjqa rrtteewwqqzz vvccxxzzaass"},
    ])
    out = tmp_path / "qgate_corpus"
    ing = StreamingIngest(
        str(out), baseline, drift_threshold_bits=1e9, quality_threshold=0.5
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = ing.run(stream, str(tmp_path / "ckpt_qg"))
    q.awaitTermination(120)
    kept = spark.read.parquet(str(out / "batch_id=0"))
    assert [r.doc_id for r in kept.collect()] == [1]
    assert ing.manifest[0]["n_in"] == 2 and ing.manifest[0]["n_gated"] == 1


def test_streaming_ingest_capstone_end_to_end(spark, tmp_path):
    import json as _json

    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import bucket_profile
    from flink_ms_spark.streaming.ingest import StreamingIngest

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    baseline = bucket_profile(docs)
    texts = [r.text for r in docs.limit(4).collect()]

    rules_path = tmp_path / "rules.json"
    rules_path.write_text(_json.dumps({"banned_sources": ["spam"]}))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = tmp_path / "ingest_in"
    # batch 0: in-distribution docs; one banned, one duplicate pair
    _write_docs(src, [
        {"doc_id": 1, "text": texts[0], "source": "ok"},
        {"doc_id": 2, "text": texts[0], "source": "ok"},     # near-dup of 1
        {"doc_id": 3, "text": texts[1], "source": "spam"},   # banned
        {"doc_id": 4, "text": texts[2], "source": "ok"},
    ])
    out = tmp_path / "corpus"
    ing = StreamingIngest(str(out), baseline, rules_path=str(rules_path),
                          drift_threshold_bits=4.0)
    stream = spark.readStream.schema(schema).json(str(src))
    q = ing.run(stream, str(tmp_path / "ckpt_ing"))
    q.awaitTermination(120)

    m = _json.loads((out / "_manifest.json").read_text())
    assert m[0]["action"] == "ingested"
    assert m[0]["n_in"] == 4 and m[0]["n_gated"] == 3 and m[0]["n_written"] == 2
    kept = spark.read.parquet(str(out / "batch_id=0"))
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4]

    # batch 1: alien content → quarantined, nothing enters the corpus
    _write_docs(src, [
        {"doc_id": 10, "text": "zzalien " * 60, "source": "ok"},
    ])
    q = ing.run(stream, str(tmp_path / "ckpt_ing"))
    q.awaitTermination(120)
    m = _json.loads((out / "_manifest.json").read_text())
    assert m[1]["action"] == "quarantined"
    assert (out / "_quarantine" / "batch_id=1").exists()
    assert not (out / "batch_id=1").exists()


def test_streaming_ewma_matches_sequential_recursion(spark, tmp_path):
    """StreamingEwma folds per-key batch means with
    s <- a*x + (1-a)*s across micro-batches (seed = first x); state is
    one double per key and history records every (batch, key, x, s)."""
    from flink_ms_spark.streaming.drift import StreamingEwma

    src = tmp_path / "ewma_in"
    src.mkdir(parents=True, exist_ok=True)
    # three files -> three micro-batches (maxFilesPerTrigger=1)
    for i, vals in enumerate([(10.0, 20.0), (40.0, 60.0), (5.0, 15.0)]):
        (src / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"event_type": "a", "value": v}) for v in vals
            )
        )
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    mon = StreamingEwma(alpha=0.5)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = mon.run(stream, str(tmp_path / "ckpt_ewma"))
    q.awaitTermination(120)

    assert len(mon.history) == 3
    # replay the recursion over the observed batch-mean sequence
    s = None
    for _bid, key, x, ewma in mon.history:
        assert key == "a"
        s = x if s is None else 0.5 * x + 0.5 * s
        assert abs(ewma - s) < 1e-12
    assert abs(mon.state["a"] - s) < 1e-12
    # batch means were (15, 50, 10) in some file order; the final state
    # must lie inside the observed value hull either way
    assert 10.0 <= mon.state["a"] <= 50.0


def test_streaming_ewma_reseed_from_ledger_continues_series(spark):
    """Restart continuity (ADVICE r5): state is an in-memory dict that
    does NOT survive a checkpointed restart — a restarting job must
    seed_state_from its persisted ledger or every key silently reseeds.
    Pin that a reseeded instance continues the recursion exactly where
    a continuous run would be, and that an unseeded one does not."""
    from flink_ms_spark.streaming.drift import StreamingEwma

    def batch(vals):
        return spark.createDataFrame(
            [("a", float(v)) for v in vals], "event_type STRING, value DOUBLE"
        )

    # continuous run: three batches with means 15, 50, 10
    cont = StreamingEwma(alpha=0.5)
    for bid, vals in enumerate([(10.0, 20.0), (40.0, 60.0), (5.0, 15.0)]):
        cont.update(batch(vals), bid)
    want = cont.state["a"]  # 0.5*10 + 0.5*(0.5*50 + 0.5*15)

    # crashed-after-batch-1 run: its ledger holds batches 0 and 1
    first = StreamingEwma(alpha=0.5)
    first.update(batch((10.0, 20.0)), 0)
    first.update(batch((40.0, 60.0)), 1)
    ledger = spark.createDataFrame(
        first.history, "batch_id LONG, key STRING, x DOUBLE, ewma DOUBLE"
    )

    # restarted instance: empty dict, seeded from the ledger (max_by
    # batch_id picks batch 1's ewma, not batch 0's), then batch 2
    restarted = StreamingEwma(alpha=0.5)
    assert restarted.seed_state_from(ledger) == 1
    assert abs(restarted.state["a"] - first.state["a"]) < 1e-12
    restarted.update(batch((5.0, 15.0)), 2)
    assert abs(restarted.state["a"] - want) < 1e-12

    # without the seed, the key reseeds (s = first post-restart x = 10)
    unseeded = StreamingEwma(alpha=0.5)
    unseeded.update(batch((5.0, 15.0)), 2)
    assert abs(unseeded.state["a"] - 10.0) < 1e-12
    assert abs(unseeded.state["a"] - want) > 1.0


def test_compact_registry_failed_swap_keeps_or_restores_registry(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9: Hadoop rename reports failure by returning false; a
    failed swap must abort loudly with the registry still present —
    never silently leave NO registry (which would re-admit every
    previously-dropped duplicate)."""
    import pytest

    from flink_ms_spark import fsutil
    from flink_ms_spark.streaming import neardup as nd_mod

    reg = str(tmp_path / "reg_swap")
    nd = nd_mod.StreamingNearDup(reg)
    nd.process_batch(
        spark.createDataFrame([(1, "alpha beta gamma " * 4)], DOC_SCHEMA), 0
    ).collect()
    rows_before = spark.read.parquet(reg).count()
    real_rename = fsutil.rename

    # failure on the FIRST rename (live -> .old): registry untouched
    monkeypatch.setattr(fsutil, "rename", lambda s, a, b: False)
    with pytest.raises(IOError, match="aside"):
        nd_mod.compact_registry(spark, reg, target_files=1)
    assert spark.read.parquet(reg).count() == rows_before

    # failure on the SECOND rename (tmp -> live): old registry restored
    calls = {"n": 0}

    def fail_second(s, a, b):
        calls["n"] += 1
        return real_rename(s, a, b) if calls["n"] != 2 else False

    monkeypatch.setattr(fsutil, "rename", fail_second)
    with pytest.raises(IOError, match="restored"):
        nd_mod.compact_registry(spark, reg, target_files=1)
    assert spark.read.parquet(reg).count() == rows_before

    # and with renames healthy again the compaction still succeeds
    monkeypatch.setattr(fsutil, "rename", real_rename)
    stats = nd_mod.compact_registry(spark, reg, target_files=1)
    assert stats["rows_after"] == rows_before


def test_streaming_ingest_with_chunk_gate_capstone(spark, tmp_path):
    """Full ingestion story (VERDICT r10 #7): signature dedup -> chunk
    content dedup -> write, with BOTH registries idempotent under a
    replayed batch_id. The quilt doc (60% of an admitted doc's content
    + 40% fresh) deterministically passes the LSH signature gate (no
    band collision at this overlap for these fixed texts — minhash is
    pure md5 math) and must be caught by the chunk-level gate."""
    import hashlib as _hl

    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import bucket_profile
    from flink_ms_spark.streaming.ingest import StreamingIngest

    def _txt(n, seed):
        out, i = [], 0
        while len(out) < n:
            h = _hl.md5(f"{seed}:{i}".encode()).hexdigest()
            out.extend(chr(ord("a") + int(c, 16) % 26) for c in h)
            i += 1
        return "".join(out[:n])

    baseline = bucket_profile(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    out = tmp_path / "corpus"
    ing = StreamingIngest(
        str(out), baseline, drift_threshold_bits=1e9,
        chunk_max_dup_ratio=0.45,
    )

    def _batch(rows):
        return spark.createDataFrame(
            rows, "doc_id LONG, text STRING, source STRING"
        )

    p = _txt(600, "P")
    # batch 0: unique doc + its exact copy (signature gate drops it)
    ing.process_batch(_batch([(1, p, "ok"), (2, p, "ok")]), 0)
    assert ing.manifest[0]["n_written"] == 1
    assert [r.doc_id for r in spark.read.parquet(str(out / "batch_id=0")).collect()] == [1]

    # batch 1: quilt (passes LSH, 60% chunk-dup -> chunk gate drops)
    # + a genuinely fresh doc
    quilt = p[:360] + _txt(240, "Q")
    fresh = _txt(600, "R")
    ing.process_batch(_batch([(10, quilt, "ok"), (11, fresh, "ok")]), 1)
    kept1 = sorted(
        r.doc_id for r in spark.read.parquet(str(out / "batch_id=1")).collect()
    )
    assert kept1 == [11], "quilt must fall to the chunk gate, fresh admitted"

    def _reg_state():
        band = spark.read.parquet(str(out / "_registry"))
        chunk = spark.read.parquet(str(out / "_chunk_registry"))
        return (
            sorted(map(tuple, band.select("doc_id", "band", "band_sig").collect())),
            sorted(map(tuple, chunk.select("doc_id", "chunk_hash").collect())),
        )

    before = _reg_state()
    # replay batch 1 (foreachBatch retry): identical verdicts, both
    # registries bit-identical afterwards
    ing.process_batch(_batch([(10, quilt, "ok"), (11, fresh, "ok")]), 1)
    kept1r = sorted(
        r.doc_id for r in spark.read.parquet(str(out / "batch_id=1")).collect()
    )
    assert kept1r == [11]
    assert _reg_state() == before

    # maintenance-window compaction of BOTH registries, then one more
    # batch: the exact copy falls to the band gate, the quilt to the
    # chunk gate (now served from the compacted base), fresh admitted
    stats = ing.compact_registries(spark)
    assert {"band", "chunk"} <= set(stats)
    ing.process_batch(
        _batch([(20, p, "ok"), (21, quilt, "ok"), (22, _txt(600, "S"), "ok")]), 2
    )
    kept2 = sorted(
        r.doc_id for r in spark.read.parquet(str(out / "batch_id=2")).collect()
    )
    assert kept2 == [22]


def test_compact_registries_skips_empty_registries(spark, tmp_path):
    """compact_registries on a virgin ingest (nothing registered yet)
    must skip cleanly instead of dying on parquet schema inference —
    and an empty band registry must not abort the chunk compaction."""
    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import bucket_profile
    from flink_ms_spark.streaming.ingest import StreamingIngest

    baseline = bucket_profile(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    ing = StreamingIngest(
        str(tmp_path / "corpus"), baseline, chunk_max_dup_ratio=0.5
    )
    stats = ing.compact_registries(spark)
    assert stats == {
        "band": {"skipped": "empty registry"},
        "chunk": {"skipped": "empty registry"},
    }


def test_compact_registries_refolds_chunk_base_with_empty_live(spark, tmp_path):
    """ADVICE r11: once a chunk base manifest exists, compact_registries
    must run the chunk compactor even when the live tier has zero
    parquet files — the refold is what GCs crash-orphaned generation
    dirs, and gating on live files alone left that debris unreclaimed
    until new batches happened to arrive."""
    from flink_ms_spark import fsutil
    from flink_ms_spark.sources.tables import load_table
    from flink_ms_spark.streaming.drift import bucket_profile
    from flink_ms_spark.streaming.ingest import StreamingIngest

    baseline = bucket_profile(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    import hashlib as _h

    text = "".join(
        chr(ord("a") + int(c, 16) % 26)
        for i in range(20)
        for c in _h.md5(f"A:{i}".encode()).hexdigest()
    )[:600]
    out = tmp_path / "corpus"
    ing = StreamingIngest(
        str(out), baseline, drift_threshold_bits=1e9, chunk_max_dup_ratio=0.5
    )
    ing.process_batch(
        spark.createDataFrame(
            [(1, text, "ok")], "doc_id LONG, text STRING, source STRING"
        ),
        0,
    )
    first = ing.compact_registries(spark)
    assert first["chunk"]["generation"] == 0

    # live tier is now empty; plant flip-window debris in the base
    chunk_reg = ing.chunkdedup.registry_dir
    assert fsutil.count_files(spark, chunk_reg, ".parquet") == 0
    base = chunk_reg.rstrip("/") + "_base"
    spark.read.parquet(fsutil.join(base, "gen=0")).write.parquet(
        fsutil.join(base, "gen=77")
    )

    second = ing.compact_registries(spark)
    assert second["chunk"].get("skipped") is None, (
        "chunk compaction must run off the base manifest alone"
    )
    assert second["chunk"]["generation"] == 1
    names = set(fsutil.list_names(spark, base, dirs_only=True))
    assert names == {"gen=1"}, f"orphaned generations not reclaimed: {names}"
