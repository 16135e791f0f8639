"""Sketch-accelerated operators — bounded-memory summaries that avoid
full-cardinality shuffles at 100 TB.

Two families:

**Misra-Gries heavy hitters** (`misra_gries_candidates` /
`heavy_hitter_terms`): the exact heavy-hitter query (`GROUP BY term
HAVING count > N/k`) shuffles the full vocabulary — at web scale that
is billions of distinct n-grams, most of which are singletons that
cannot possibly pass the threshold. The sketch plan is two passes:

1. Per-partition Misra-Gries summaries via ``mapInPandas`` (Arrow
   batches, vectorized ``value_counts`` merge — no per-row Python).
   Zero shuffle; each partition emits at most ``sketch_k`` rows.
   Guarantee (pigeonhole + the MG undercount bound of
   n_p/(sketch_k+1)): every term with GLOBAL count > N/(sketch_k+1)
   survives in at least one partition, so the unioned candidate set
   has **no false negatives** for any threshold N/t with
   t ≤ sketch_k.
2. Broadcast the tiny candidate set back over the token stream and
   exact-count candidates only. The shuffle carries
   ≤ |candidates| × |partitions| rows instead of |vocab| rows, and the
   final counts are EXACT — the sketch only prunes, never approximates
   the output. Hence the result is DuckDB-oracle-checkable.

**HyperLogLog rollups** (`hll_rollup`): Spark 3.5+/4.x exposes Apache
DataSketches HLL as first-class aggregates (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``). The 100 TB pattern is
pre-aggregation: sketch once per fine bucket (day), persist the binary
sketches (bytes per bucket, not rows), and answer any coarser distinct
rollup (month / quarter / global) by MERGING sketches — no re-scan of
the raw events. Estimates are approximate (~0.4-1.6% typical rel.
error at default lgConfigK=12), so these queries are rows-only checked;
tests pin the relative error against exact distinct counts.

Reference scope note: the reference (mmziyad/flink-ms) has no sketch
or distinct-count surface at all (SURVEY.md §2.9) — this module is
part of the north-star training-data-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, sketch_k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned (distinct).

    Returns a DataFrame with the single column ``col`` holding every
    term that survived some partition's ``sketch_k``-counter summary —
    a superset of all terms with global frequency > N/(sketch_k+1).

    The merge step is the mergeable-summaries form (Agarwal et al.,
    "Mergeable Summaries", PODS'12): add exact batch counts, then
    subtract the (k+1)-th largest value from every counter and drop
    non-positives — vectorized over each Arrow batch, never per-row.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            bc = pdf[col].value_counts()
            counts = counts.add(bc, fill_value=0) if len(counts) else bc.astype("int64")
            if len(counts) > sketch_k:
                kth = counts.nlargest(sketch_k + 1).iloc[-1]
                counts = counts - kth
                counts = counts[counts > 0]
        yield pd.DataFrame({col: counts.index.astype(str)})

    return df.select(col).mapInPandas(mg, f"{col} string").distinct()


def heavy_hitter_terms(
    tokens: DataFrame,
    col: str = "term",
    threshold_k: int = 200,
    sketch_k: int = 1000,
) -> DataFrame:
    """Exact terms with count > N/threshold_k, sketch-pruned.

    ``sketch_k`` must be ≥ ``threshold_k`` for the no-false-negative
    guarantee (we default to 5× for slack). Output: (col, cnt) — cnt is
    the exact global count, so the result hash-matches a plain
    GROUP BY/HAVING oracle while the plan never shuffles the full
    vocabulary.
    """
    if sketch_k < threshold_k:
        raise ValueError("sketch_k must be >= threshold_k for exactness")
    cand = misra_gries_candidates(tokens, col, sketch_k)
    total = tokens.agg(F.count("*").alias("n"))
    counted = (
        tokens.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n") / threshold_k)
        .select(col, "cnt")
    )


def hll_rollup(
    df: DataFrame,
    time_col: str,
    key_col: str,
    coarse_fmt: str = "yyyy-MM",
) -> DataFrame:
    """Distinct-count rollup via mergeable HLL sketches.

    Stage 1 sketches per day (the persistable fine-grained summary);
    stage 2 answers the coarse bucket by unioning day sketches. At
    100 TB only stage 1 touches raw data; every subsequent rollup
    granularity is a merge over |days| sketch blobs.

    Returns (bucket, est_distinct) sorted by bucket.
    """
    daily = df.groupBy(F.to_date(F.col(time_col)).alias("day")).agg(
        F.hll_sketch_agg(key_col).alias("sketch")
    )
    return (
        daily.groupBy(F.date_format("day", coarse_fmt).alias("bucket"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"))
        .orderBy("bucket")
    )
