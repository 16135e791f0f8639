"""Persisted IVF-PQ index: build-once serve-many parity with the
all-pairs report, O(n_probe) partition IO, swap coherence, and the
pinned batch-only freshness contract."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vec_df(spark, ids, vecs):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


@pytest.fixture
def ivfpq(spark, tmp_path):
    from flink_ms_spark.operators.similarity import build_ivfpq_index

    rng = np.random.default_rng(109)
    vecs = rng.normal(size=(80, 8))
    idx = str(tmp_path / "ivfpq")
    df = _vec_df(spark, range(80), vecs)
    cents, cb = build_ivfpq_index(df, idx, n_cells=4, n_subspaces=4, n_codes=8)
    return idx, vecs, cents, cb


def test_persisted_serve_matches_all_pairs_report(spark, ivfpq):
    """ivfpq_query_topk over the persisted index reproduces
    ivf_pq_topk's rows exactly when every corpus vector queries — the
    persisted serve is the same contract (probe, encode, ADC order,
    rank), just build-once."""
    from flink_ms_spark.operators.similarity import ivf_pq_topk, ivfpq_query_topk

    idx, vecs, cents, cb = ivfpq
    corpus = _vec_df(spark, range(80), vecs)
    got = sorted(map(tuple, ivfpq_query_topk(
        spark, idx, corpus, k=3, n_probe=2).collect()))
    want = sorted(map(tuple, ivf_pq_topk(
        corpus, cents, cb, k=3, n_probe=2).collect()))
    assert got == want


def test_lookup_reads_only_probed_cell_partitions(spark, ivfpq):
    """The 100 TB property: a lookup probing one cell does not depend
    on the other cells' code partitions even existing."""
    from flink_ms_spark.operators.similarity import ivfpq_query_topk

    idx, vecs, cents, cb = ivfpq
    q = _vec_df(spark, [-1], [cents[2] + 0.001])  # probes cell 2 first
    before = sorted(map(tuple, ivfpq_query_topk(
        spark, idx, q, k=3, n_probe=1).collect()))
    assert before, "probed cell must not be empty"
    for c in (0, 1, 3):
        shutil.rmtree(os.path.join(idx, "codes", "gen=0", f"cell={c}"))
    after = sorted(map(tuple, ivfpq_query_topk(
        spark, idx, q, k=3, n_probe=1).collect()))
    assert after == before


def test_serve_fails_loud_when_generation_swapped_mid_serve(spark, ivfpq):
    """Swap coherence: the serve pins the generation its artifacts
    loaded under through the code read — a rebuild bumping the
    manifest mid-serve raises instead of pricing another generation's
    codes."""
    from flink_ms_spark.operators.similarity import (
        INDEX_MANIFEST,
        ivfpq_query_topk,
    )

    idx, vecs, cents, cb = ivfpq
    # simulate a rebuild that bumped the manifest but whose codes/gen=1
    # this serve must NOT silently miss or mix (written via fsutil —
    # a plain open() write leaves Hadoop's .crc sidecar stale)
    from flink_ms_spark import fsutil

    fsutil.replace_text(
        spark, os.path.join(idx, INDEX_MANIFEST),
        json.dumps({"kind": "ivfpq", "generation": 1}),
    )
    q = _vec_df(spark, [-1], [cents[0] + 0.001])
    with pytest.raises(IOError, match="generation 1"):
        ivfpq_query_topk(spark, idx, q, k=3).collect()


def test_empty_and_corpus_scale_query_frames(spark, ivfpq):
    from flink_ms_spark.operators.similarity import ivfpq_query_topk

    idx, vecs, *_ = ivfpq
    corpus = _vec_df(spark, range(80), vecs)
    out = ivfpq_query_topk(spark, idx, corpus.where(F.lit(False)), k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["a", "b", "ad2", "rk"]
    with pytest.raises(ValueError, match="ivf_pq_topk"):
        ivfpq_query_topk(spark, idx, corpus, k=3, max_queries=10)


def test_ivfpq_is_batch_only_by_contract(spark, ivfpq):
    """Pins the freshness contract: no streaming increment lane — the
    ingest worker refuses the kind loudly and names the refresh path."""
    from flink_ms_spark.streaming.ann_ingest import StreamingAnnIngest

    idx, *_ = ivfpq
    with pytest.raises(ValueError, match="batch-only"):
        StreamingAnnIngest(spark, idx)


def test_cli_ivfpq_build_query_status_reindex(spark, tmp_path, capsys):
    """The CLI lifecycle for the ivfpq kind: build persists all three
    artifacts, ann-query serves the nearest code partition (self point
    first), ann-status reads the stamped layout, reindex-ann refuses
    with the documented batch-rebuild path."""
    from flink_ms_spark import cli

    rng = np.random.default_rng(113)
    vecs = rng.normal(size=(60, 8)).astype("float64")
    src = tmp_path / "emb"
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).write.parquet(str(src))
    idx = str(tmp_path / "idx")
    cli.main(["build-ann-index", "--kind", "ivfpq", "--input", str(src),
              "--index", idx, "--cells", "4", "--subspaces", "4",
              "--codes", "8"])
    out = capsys.readouterr().out
    assert "ivfpq, 4 cells, 4 subspaces x 8 codes" in out
    assert os.path.isdir(os.path.join(idx, "codes", "gen=0"))

    probe = 11
    vec_arg = ",".join(f"{x:.8f}" for x in vecs[probe])
    cli.main(["ann-query", "--index", idx, f"--vector={vec_arg}", "-k", "3"])
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert int(lines[0].split("\t")[0]) == probe  # self shares every code
    d = [float(l.split("\t")[1]) for l in lines]
    assert d == sorted(d)

    cli.main(["ann-status", "--index", idx])
    s = dict(l.split("\t") for l in capsys.readouterr().out.splitlines()
             if "\t" in l)
    assert s["kind"] == "ivfpq" and s["generation"] == "0"
    assert s["base_rows"] == "60"

    with pytest.raises(SystemExit, match="batch-only"):
        cli.main(["reindex-ann", "--index", idx, "--input", str(src)])
