"""Semantic tests for the round-7 pipeline-health family
(plans/hygiene.py). Cross-engine value parity is the oracle gate's job
(tests/test_oracle.py covers the full catalog); these pin the
SEMANTICS on crafted inputs where the right answer is known by hand.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_ms_spark.plans.catalog import QUERIES


def test_embedding_health_counts_zero_and_nonfinite(spark, tmp_path, monkeypatch):
    import flink_ms_spark.plans.hygiene as hy

    rows = [
        (1, [3.0, 4.0], 0),          # norm 5
        (2, [0.0, 0.0], 0),          # zero vector
        (3, [float("nan"), 1.0], 0),  # non-finite
        (4, [float("inf"), 1.0], 0),  # non-finite
        (5, [1.0, 0.0, 0.0], 1),      # dim drift: 3 dims
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    monkeypatch.setattr(hy, "load_table", lambda s, d, t: df)
    out = QUERIES["embedding_health"](spark, "ignored").collect()[0]
    assert out.n_vectors == 5
    assert (out.dims_min, out.dims_max) == (2, 3)
    assert out.n_nonfinite == 2
    assert out.n_zero_vectors == 1


def test_dead_dims_flags_constant_dimension(spark, monkeypatch):
    import flink_ms_spark.plans.hygiene as hy

    # dim 2 is frozen at 7.0; dims 1 and 3 vary
    rows = [(i, [float(i), 7.0, float(-i)], 0) for i in range(1, 5)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    monkeypatch.setattr(hy, "load_table", lambda s, d, t: df)
    out = {r.dim: r for r in QUERIES["dead_dims"](spark, "ignored").collect()}
    assert set(out) == {1, 2, 3} and all(r.n == 4 for r in out.values())
    assert out[2].is_dead == 1 and out[2].variance == 0.0
    assert out[1].is_dead == 0 and out[1].variance > 0
    assert (out[2].mn, out[2].mx) == (7.0, 7.0)


def test_token_gini_uniform_is_zero_and_concentrated_is_high(spark, monkeypatch):
    import flink_ms_spark.plans.hygiene as hy

    uniform = [(i, "a b c d", "en", "u", 7) for i in range(1, 9)]
    # one giant doc holds nearly all tokens of source "c"
    giant = " ".join(["w"] * 396)
    conc = [(100 + i, "w", "en", "c", 1) for i in range(1, 5)] + [
        (200, giant, "en", "c", len(giant))
    ]
    df = spark.createDataFrame(
        uniform + conc, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(hy, "load_table", lambda s, d, t: df)
    out = {r.source: r for r in QUERIES["token_gini_by_source"](spark, "x").collect()}
    assert out["u"].gini == 0.0 and out["u"].n_docs == 8
    assert out["u"].total_tokens == 8 * 4
    # hand-computed: x = [1,1,1,1,396] asc, n=5, S=400,
    # T = 1+2+3+4+5*396 = 1990 -> G = (2*1990 - 6*400)/(5*400) = 0.79
    assert out["c"].total_tokens == 400
    assert abs(out["c"].gini - 0.79) < 1e-9


def test_cross_source_dup_matrix_diagonal_and_symmetry(spark, sf_oracle):
    rows = QUERIES["cross_source_dup_matrix"](spark, sf_oracle).collect()
    assert rows, "fixture corpus has near-dup components"
    cells = {(r.source_a, r.source_b): r.n_components for r in rows}
    for (a, b), n in cells.items():
        assert a <= b and n >= 1
        # an off-diagonal cell implies both diagonal cells exist and
        # are at least as large (that component touches both sources)
        if a != b:
            assert cells.get((a, a), 0) >= n and cells.get((b, b), 0) >= n


def test_minhash_calibration_levels_and_bounds(spark, sf_oracle):
    rows = QUERIES["minhash_calibration"](spark, sf_oracle).collect()
    assert rows, "fixture corpus has LSH candidate pairs"
    for r in rows:
        # candidates collide on >=1 of 4 hashes by construction
        assert 1 <= r.n_agree <= 4
        assert math.isclose(r.est_jaccard, r.n_agree / 4.0)
        assert 0.0 <= r.min_jaccard <= r.avg_jaccard <= r.max_jaccard <= 1.0
        assert 0.0 <= r.mae <= 1.0 and r.n_pairs >= 1
    # exact duplicates (4/4 agreement) exist in the fixture and must
    # average a higher true jaccard than 1/4-agreement collisions
    by = {r.n_agree: r for r in rows}
    if 4 in by and 1 in by:
        assert by[4].avg_jaccard > by[1].avg_jaccard


def test_embedding_health_and_dead_dims_on_fixture(spark, sf_oracle):
    """Fixture-level sanity: consistent dims, no NaNs in the synthetic
    embeddings, dead_dims emits one row per dimension."""
    h = QUERIES["embedding_health"](spark, sf_oracle).collect()[0]
    assert h.dims_min == h.dims_max and h.n_nonfinite == 0
    dd = QUERIES["dead_dims"](spark, sf_oracle).collect()
    assert len(dd) == h.dims_min
    assert all(r.n == h.n_vectors for r in dd)


def test_dead_dims_oracle_matches_on_ragged_dims(spark, tmp_path, monkeypatch):
    """ADVICE r7 (medium): on dim-INCONSISTENT embeddings the oracle's
    generate_series(1, max_dims) emits NULL rows for out-of-range v[i];
    count(*) would count them (n = total vectors) while Spark's
    posexplode counts only real elements. The WHERE i.i <= len(e.v)
    filter keeps the two engines identical exactly when dims drift —
    the state this family exists to detect."""
    import duckdb

    import flink_ms_spark.plans.hygiene as hy
    from flink_ms_spark.oracle import canonical_rows
    from flink_ms_spark.plans.registry import ORACLE_SQL

    rows = [
        (1, [1.0, 2.0], 0),
        (2, [3.0], 0),
        (3, [5.0, 2.0, 7.0, 8.0], 0),
        (4, [9.0, 2.0, 6.0], 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    monkeypatch.setattr(hy, "load_table", lambda s, d, t: df)
    out = QUERIES["dead_dims"](spark, "ignored")
    s_rows = {r.dim: r for r in out.collect()}
    # n counts only vectors HAVING that dim: 4,3,2,1
    assert {d: r.n for d, r in s_rows.items()} == {1: 4, 2: 3, 3: 2, 4: 1}
    assert s_rows[2].is_dead == 1  # 2.0 everywhere it exists

    pq = str(tmp_path / "embeddings_parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{pq}/*.parquet'"
    )
    cur = con.execute(ORACLE_SQL["dead_dims"])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(d_cols) == sorted(out.columns)
    assert canonical_rows(out.columns, [tuple(r) for r in out.collect()]) == (
        canonical_rows(d_cols, d_rows)
    )
