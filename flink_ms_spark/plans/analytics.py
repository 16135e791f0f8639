"""Dataset-analytics queries: one-pass column profiling, graph
triangle census, CUSUM changepoint series, sketch-pruned exact heavy
hitters, and mergeable-HLL distinct rollups.

These extend the north-star pipeline surface (the reference has no
profiling/sketch/graph layer — SURVEY.md §2.9); each is designed
around the shuffle that would dominate at 100 TB (see module
docstrings in operators/sketches.py and operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark.operators.graph import cooccurrence_edges, triangle_count
from flink_ms_spark.operators.sketches import heavy_hitter_terms, hll_rollup
from flink_ms_spark.plans.registry import register, register_sql
from flink_ms_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Column profiling: per-column (rows, nulls, distinct, min/max) — the
# data-quality snapshot a pipeline runs before training. Numeric
# min/max as DOUBLE, string min/max lexicographic; one output row per
# profiled column. Plan: one independent branch per column — a
# two-phase exact distinct (groupBy(col) partial-aggregated map-side,
# then a 1-row agg that derives rows/nulls/distinct/min/max from the
# group table) — unioned. Each branch scans ONE column (columnar
# pruning) and shuffles |distinct(col)| rows (the floor for exact
# distinct); branches are independent DAG stages so they schedule
# concurrently. Measured 2.6× faster at sf0.1 than the single-pass
# multi-COUNT(DISTINCT) form, whose Expand multiplies every row
# k+1-fold through one shuffle. Swap in approx_count_distinct when
# exactness isn't contractual (the oracle needs exact).

_PROFILE_COLS = [
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, is_num in _PROFILE_COLS:
        if is_num:
            mn = f"CAST(min({c}) AS DOUBLE)"
            mx = f"CAST(max({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"min({c})", f"max({c})"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str "
            f"FROM orders"
        )
    return " UNION ALL ".join(parts)


def _profile_branch(table: DataFrame, c: str, is_num: bool) -> DataFrame:
    # groupBy(col) keeps the null group, so sum(cnt) is the full row
    # count and min/max over group keys equal min/max over raw rows.
    g = table.groupBy(c).agg(F.count("*").alias("cnt"))
    agg = g.agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col(c).isNotNull(), F.col("cnt")).otherwise(F.lit(0))).alias(
            "nn"
        ),
        F.count(F.when(F.col(c).isNotNull(), F.lit(1))).alias("nd"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
    )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    return agg.select(
        F.lit(c).alias("col_name"),
        F.col("n_rows"),
        (F.col("n_rows") - F.col("nn")).alias("n_nulls"),
        F.col("nd").alias("n_distinct"),
        (F.col("mn").cast("double") if is_num else null_d).alias("min_num"),
        (F.col("mx").cast("double") if is_num else null_d).alias("max_num"),
        (null_s if is_num else F.col("mn").cast("string")).alias("min_str"),
        (null_s if is_num else F.col("mx").cast("string")).alias("max_str"),
    )


@register("column_profile", oracle=_profile_oracle())
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profile of orders: per column rows / nulls / exact
    distinct / typed min-max, one concurrent branch per column."""
    orders = load_table(spark, sf_dir, "orders")
    branches = [_profile_branch(orders, c, n) for c, n in _PROFILE_COLS]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


# --------------------------------------------------------------------------
# Triangle census of the part co-purchase graph (parts linked when they
# appear in the same order). Spark counts via degree orientation
# (skew-robust, orientation-invariant count); the oracle uses the
# plain id-ordered 3-way join — same number, different physical story.

_TRIANGLE_ORACLE = """
WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*) FROM e e1
          JOIN e e2 ON e1.v = e2.u
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


@register("triangle_copurchase", oracle=_TRIANGLE_ORACLE)
def q_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge + triangle counts of the co-purchase graph — the clustering
    structure signal (basis of clustering coefficient / community
    detection) via the compact-forward oriented join."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return triangle_count(edges)


# --------------------------------------------------------------------------
# CUSUM changepoint series over daily order revenue: cumulative sum of
# deviations from the (rounded) global mean — the classic shift
# detector; the changepoint is the |cusum| peak. Window is a global
# ORDER BY over |days| rows (aggregate cardinality, not row count), so
# the single-partition window is safe at any raw-data scale.

_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), m AS (SELECT CAST(round(avg(revenue), 2) AS DOUBLE) AS mu FROM daily)
SELECT day, revenue,
       CAST(round(sum(revenue - mu)
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            2) AS DOUBLE) AS cusum
FROM daily CROSS JOIN m
"""

register_sql("cusum_changepoint", _CUSUM_SQL)


# --------------------------------------------------------------------------
# Heavy hitters: exact terms with count > N/200, found without ever
# shuffling the full vocabulary (Misra-Gries candidate pruning, then
# broadcast-joined exact recount — operators/sketches.py). Oracle is
# the naive GROUP BY/HAVING: identical rows, vocabulary-sized shuffle.

_HH_ORACLE = """
WITH toks AS (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
              FROM documents),
t AS (SELECT term FROM toks WHERE term <> ''),
tot AS (SELECT count(*) AS n FROM t)
SELECT term, count(*) AS cnt
FROM t CROSS JOIN tot
GROUP BY term, n
HAVING count(*) > n / 200.0
"""


@register("heavy_hitter_terms", oracle=_HH_ORACLE)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms with frequency > 1/200 of the corpus — exact counts via
    the two-pass sketch-pruned plan."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    ).where("term <> ''")
    return heavy_hitter_terms(tokens, "term", threshold_k=200, sketch_k=1000)


# --------------------------------------------------------------------------
# Mergeable-HLL monthly distinct users: day sketches unioned to month.
# Approximate by construction → no DuckDB value oracle (rows-only
# driver check); tests/test_analytics.py pins relative error vs exact.


@register("hll_daily_users")
def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct-user estimates from merged per-day HLL
    sketches (DataSketches HLL via hll_sketch_agg/hll_union_agg)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "t", F.col("ts").cast("timestamp")
    )
    return hll_rollup(events, "t", "user_id", "yyyy-MM").select(
        F.col("bucket").alias("month"), F.col("est_distinct").alias("est_users")
    )
