"""Analytics-family tests beyond the oracle gate: the Misra-Gries
no-false-negative property, HLL estimate accuracy, and the
plan-shape/scale contracts of the sketch-pruned heavy-hitter plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ms_spark.operators.graph import cooccurrence_edges, triangle_count
from flink_ms_spark.operators.sketches import (
    heavy_hitter_terms,
    hll_rollup,
    misra_gries_candidates,
)
from flink_ms_spark.sources.tables import load_table


def _tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    ).where("term <> ''")


def test_misra_gries_no_false_negatives(spark, sf_oracle):
    """Every term above the threshold must appear in the candidate
    set, even with a deliberately tight sketch (k=250 vs threshold
    N/200) and few counters per partition."""
    toks = _tokens(spark, sf_oracle).repartition(8)
    n = toks.count()
    exact = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > n / 200.0)
    )
    truth = {r.term for r in exact.collect()}
    cands = {r.term for r in misra_gries_candidates(toks, "term", 250).collect()}
    assert truth <= cands, f"missed heavy hitters: {truth - cands}"


def test_heavy_hitters_counts_are_exact(spark, sf_oracle):
    toks = _tokens(spark, sf_oracle)
    n = toks.count()
    exact = {
        (r.term, r.cnt)
        for r in toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > n / 200.0)
        .collect()
    }
    sketched = {
        (r.term, r.cnt)
        for r in heavy_hitter_terms(toks, "term", 200, 1000).collect()
    }
    assert sketched == exact


def test_heavy_hitter_recount_is_broadcast(spark, sf_oracle):
    """The exact-recount join must broadcast the candidate set — the
    token stream (100 TB side) never shuffles on term."""
    df = heavy_hitter_terms(_tokens(spark, sf_oracle), "term", 200, 1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_rollup_accuracy(spark, sf_oracle):
    """Merged day-sketch estimates within 5% of exact monthly
    distincts (default lgConfigK=12 ⇒ ~1.6% typical rel. error)."""
    events = load_table(spark, sf_oracle, "events").withColumn(
        "t", F.col("ts").cast("timestamp")
    )
    est = {
        r.bucket: r.est_distinct
        for r in hll_rollup(events, "t", "user_id").collect()
    }
    exact = {
        r.bucket: r.n
        for r in events.groupBy(
            F.date_format(F.to_date("t"), "yyyy-MM").alias("bucket")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for b, n in exact.items():
        assert abs(est[b] - n) <= max(1, 0.05 * n), (b, est[b], n)


def test_triangle_count_matches_bruteforce(spark, sf_smoke):
    """Degree-oriented count equals the id-ordered 3-join on the
    smoke graph (orientation invariance, sanity beyond the oracle)."""
    li = load_table(spark, sf_smoke, "lineitem")
    e = cooccurrence_edges(li, "l_orderkey", "l_partkey").persist()
    row = triangle_count(e).collect()[0]
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    brute = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    assert row.n_triangles == brute
    assert row.n_edges == e.count()
