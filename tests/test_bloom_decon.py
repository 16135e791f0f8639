"""bloom_decontaminate: the bloom prefilter must be a pure
optimization — zero false negatives (bloom property) and a result
identical to the exact semi join, while actually discarding most
grams before the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _grams(spark, sf_dir):
    from flink_ms_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "source", F.split(F.trim("text"), r"\s+").alias("t")
        )
        .filter(F.size("t") >= 4)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(t) - 3),"
                        " i -> concat_ws(' ', slice(t, i, 4)))"
                    )
                )
            ).alias("gram"),
        )
    )


def test_bloom_prefilter_has_no_false_negatives_and_prunes(spark):
    import numpy as np
    from pyspark.sql.types import BooleanType

    from flink_ms_spark.plans.pipeline import _BLOOM_BITS, _bloom_positions

    grams = _grams(spark, SF)
    ev = grams.filter(F.col("doc_id") % 100 == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % 100 != 0)
    positions = (
        ev.select(
            F.explode(F.array(*_bloom_positions(F.col("gram")))).alias("pos")
        )
        .distinct()
        .collect()
    )
    bitmap = np.zeros(_BLOOM_BITS, dtype=bool)
    bitmap[[r.pos for r in positions]] = True
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def might_contain(h0, h1, h2, h3, h4):
        import pandas as pd

        bm = bc.value
        hit = bm[h0.to_numpy()]
        for h in (h1, h2, h3, h4):
            hit &= bm[h.to_numpy()]
        return pd.Series(hit)

    pre = train.where(might_contain(*_bloom_positions(F.col("gram"))))
    exact = train.join(ev, "gram", "left_semi")
    n_train, n_pre, n_exact = train.count(), pre.count(), exact.count()
    # no false negatives: every exact hit survives the prefilter
    assert (
        exact.join(pre, ["doc_id", "gram"], "left_anti").count() == 0
    ), "bloom dropped a true hit — impossible for a correct bloom filter"
    # and it actually prunes (the point of the technique)
    assert n_pre < n_train * 0.05, (n_pre, n_train)
    assert n_exact <= n_pre


def test_bloom_decontaminate_equals_exact_join(spark):
    """End-to-end: the query's per-source counts must equal the exact
    (bloom-free) computation."""
    from flink_ms_spark.plans.catalog import QUERIES

    got = {
        r.source: (r.n_docs, r.n_contaminated)
        for r in QUERIES["bloom_decontaminate"](spark, SF).collect()
    }
    grams = _grams(spark, SF)
    ev = grams.filter(F.col("doc_id") % 100 == 0).select("gram").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 100 != 0)
        .join(ev, "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    train = (
        grams.filter(F.col("doc_id") % 100 != 0)
        .select("doc_id", "source")
        .distinct()
    )
    want = {
        r.source: (r.n_docs, r.n_hit)
        for r in train.join(
            hits.withColumn("_h", F.lit(1)), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("_h", F.lit(0))).cast("long").alias("n_hit"),
        )
        .collect()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) > 0, "fixture lost all signal"
