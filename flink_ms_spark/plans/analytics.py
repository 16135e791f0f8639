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
# Approximate by construction, so the estimate itself can't hash-match
# DuckDB — instead the registered query emits the exact-distinct TWIN
# plus a deterministic accuracy-contract boolean (|est−exact| ≤ 5%,
# ~3σ of the lgK=12 sketch), and the oracle asserts exact + TRUE. A
# broken sketch path flips the boolean → driver red.
# tests/test_analytics.py additionally pins the relative error.

_HLL_TWIN_ORACLE = """
SELECT strftime(ts, '%Y-%m') AS month,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_5pct
FROM events GROUP BY 1
"""


@register("hll_daily_users", oracle=_HLL_TWIN_ORACLE)
def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct-user estimates from merged per-day HLL
    sketches (DataSketches HLL via hll_sketch_agg/hll_union_agg),
    checked against the exact-distinct twin."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "t", F.col("ts").cast("timestamp")
    )
    est = hll_rollup(events, "t", "user_id", "yyyy-MM").select(
        F.col("bucket").alias("month"), F.col("est_distinct")
    )
    exact = events.groupBy(
        F.date_format("t", "yyyy-MM").alias("month")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return est.join(exact, "month").select(
        "month",
        "exact_users",
        (
            F.abs(F.col("est_distinct") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
    )


# --------------------------------------------------------------------------
# Hopping (sliding) windows: 1-hour windows advancing every 15 minutes
# — Spark's native `window(t, size, slide)` generator, the batch twin
# of the Structured Streaming hop-window aggregation. Each event lands
# in exactly size/slide = 4 windows; Spark explodes the window slots
# BEFORE the shuffle, so the agg is a plain partial-aggregated groupBy
# on (window, event_type) — at 100 TB that's one shuffle of the
# already-combined per-partition window counts, never 4× raw rows.
# The DuckDB oracle materializes the same epoch-aligned slots
# explicitly: start = (floor(t/15min) - k) * 15min for k in 0..3.

register_sql(
    "hopping_window_counts",
    spark_sql="""
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS t, value FROM events)
SELECT window.start AS win_start, event_type,
       count(*) AS n_events,
       CAST(round(sum(value), 6) AS DOUBLE) AS sum_value
FROM e GROUP BY window(t, '1 hour', '15 minutes'), event_type
""",
    duck_sql="""
WITH k AS (SELECT unnest(range(0, 4)) AS k),
w AS (SELECT event_type, value,
             make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000)
               AS win_start
      FROM events CROSS JOIN k)
SELECT win_start, event_type, count(*) AS n_events,
       CAST(round(sum(value), 6) AS DOUBLE) AS sum_value
FROM w GROUP BY win_start, event_type
""",
)


# --------------------------------------------------------------------------
# Peak concurrency — classic interval sweep-line as SQL: each event is
# "active" for 5 minutes (clipped at midnight); emit +1/-1 boundary
# rows, running-sum them in event-time order, take the per-day maximum.
# The RANGE frame (not ROWS) makes simultaneous boundaries order-free:
# at instant p the sum includes every +1 AND -1 at p, so ends cancel
# starts at the same microsecond identically on both engines. The
# window partitions by (event_type, day) — bounded sort per partition,
# no global ordering, so the plan scales linearly with days × types.

_PEAK_CONCURRENCY = """
WITH e AS (SELECT event_type, {epoch_us} AS t FROM events),
b AS (
  SELECT event_type, t {div} 86400000000 AS day_no, t AS pt, 1 AS delta FROM e
  UNION ALL
  SELECT event_type, t {div} 86400000000 AS day_no,
         least(t + 300000000, (t {div} 86400000000 + 1) * 86400000000) AS pt,
         -1 AS delta
  FROM e
),
r AS (SELECT event_type, day_no, pt,
             sum(delta) OVER (PARTITION BY event_type, day_no ORDER BY pt
                              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS active
      FROM b)
SELECT event_type, day_no, CAST(max(active) AS BIGINT) AS peak_concurrency
FROM r GROUP BY event_type, day_no
"""
# CAST AS BIGINT on the windowed-sum output: DuckDB's integer sum()
# yields HUGEINT, which the driver's pandas fetch renders as float64
# ("3.0" vs Spark's "3") — a hash mismatch with rows/schema green.
# Same rule applied to every integer-sum output column in this module.

register_sql(
    "peak_concurrency",
    spark_sql=_PEAK_CONCURRENCY.format(
        epoch_us="unix_micros(CAST(ts AS TIMESTAMP))", div="div"
    ),
    duck_sql=_PEAK_CONCURRENCY.format(epoch_us="epoch_us(ts)", div="//"),
)


# --------------------------------------------------------------------------
# Robust outliers via median absolute deviation (MAD) — the
# breakdown-resistant cousin of zscore_outliers: med and MAD shrug off
# the very outliers they're hunting. Exact interpolated medians
# (verified bit-equal cross-engine, see value_quantiles); two grouped
# aggs + two broadcast-sized joins on event_type. Both deviation and
# threshold are rounded before comparing so the outlier count can't
# flip on a last-ulp interpolation difference.

_MAD_OUTLIERS = """
WITH m AS (SELECT event_type, {median_value} AS med
           FROM events GROUP BY event_type),
d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN m ON e.event_type = m.event_type),
s AS (SELECT event_type, {median_adev} AS mad FROM d GROUP BY event_type)
SELECT d.event_type,
       CAST(round(max(d.med), 6) AS DOUBLE) AS med,
       CAST(round(max(s.mad), 6) AS DOUBLE) AS mad,
       CAST(sum(CASE WHEN round(d.adev, 6) > round(3.5 * s.mad, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN s ON d.event_type = s.event_type
GROUP BY d.event_type
"""

register_sql(
    "mad_outliers",
    spark_sql=_MAD_OUTLIERS.format(
        median_value="percentile(value, 0.5)", median_adev="percentile(adev, 0.5)"
    ),
    duck_sql=_MAD_OUTLIERS.format(
        median_value="quantile_cont(value, 0.5)",
        median_adev="quantile_cont(adev, 0.5)",
    ),
)


# --------------------------------------------------------------------------
# Equi-depth histogram of order totals — the complement of
# value_histogram's equal-width bins. Two-phase plan built for scale:
# phase 1 computes the 9 interior decile boundaries in ONE exact
# percentile agg (sorted partial aggregation, no full collect); phase 2
# broadcasts that 1-row boundary array and bins every row with a pure
# per-row lambda fold — no shuffle beyond the final 10-group agg.
# Boundaries are rounded to 6 dp on both engines BEFORE binning so a
# value sitting on a boundary falls the same way in Spark and DuckDB.

register_sql(
    "equidepth_histogram",
    spark_sql="""
WITH b AS (SELECT transform(
             percentile(o_totalprice,
                        array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)),
             x -> round(x, 6)) AS bs
           FROM orders)
SELECT aggregate(bs, 0, (acc, x) -> acc + IF(o_totalprice >= x, 1, 0)) AS bin,
       count(*) AS n_rows,
       CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
       CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi
FROM orders CROSS JOIN b
GROUP BY 1
""",
    duck_sql="""
WITH b AS (SELECT list_transform(
             quantile_cont(o_totalprice,
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             x -> round(x, 6)) AS bs
           FROM orders)
SELECT CAST(len(list_filter(bs, x -> o_totalprice >= x)) AS INT) AS bin,
       count(*) AS n_rows,
       CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
       CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi
FROM orders CROSS JOIN b
GROUP BY 1
""",
)


# --------------------------------------------------------------------------
# Item-item neighborhood CF — the memory-based complement of the
# reference's ALS factor model (same domain: FIXTURES.md rating
# mapping, items = event_id % 200): cosine similarity between item
# co-purchase user sets, top-5 neighbors per item. The pair generation
# self-joins the DISTINCT (user, item) incidence on user_id — at
# 100 TB the quadratic blowup is bounded per user (heavy users are the
# skew risk; cap or salt them), and the item<item ordering halves the
# pairs. Ranking uses the ROUNDED cosine with the neighbor id as
# tiebreak, so top-5 is identical across engines.

_ITEM_NEIGHBORS = """
WITH ui AS (SELECT DISTINCT user_id, event_id % 200 AS item_id
            FROM events WHERE event_type = 'purchase'),
n AS (SELECT item_id, count(*) AS cnt FROM ui GROUP BY item_id),
p AS (SELECT a.item_id AS i, b.item_id AS j, count(*) AS co
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item_id < b.item_id
      GROUP BY a.item_id, b.item_id),
c AS (SELECT i, j, CAST(round(co / sqrt(ni.cnt * nj.cnt), 6) AS DOUBLE) AS cosine
      FROM p JOIN n ni ON p.i = ni.item_id JOIN n nj ON p.j = nj.item_id),
sym AS (SELECT i, j, cosine FROM c UNION ALL SELECT j AS i, i AS j, cosine FROM c),
r AS (SELECT i AS item_id, j AS neighbor, cosine,
             row_number() OVER (PARTITION BY i ORDER BY cosine DESC, j) AS rk
      FROM sym)
SELECT item_id, neighbor, cosine, rk FROM r WHERE rk <= 5
"""

register_sql("item_item_cosine", _ITEM_NEIGHBORS)


# --------------------------------------------------------------------------
# Linear multi-touch attribution — every view in the 7 days before a
# purchase shares the credit equally (1/n per touch); purchases with
# no preceding views stay with n_touches = 0. The join is EQUI on
# user_id with the time band as a residual predicate — a hash/sort
# join whose per-key fan-out is bounded by one user's history, so no
# global non-equi blowup (contrast preceding_5min_count, which has no
# equi key and needs the banded-bucket rewrite).

_ATTRIBUTION = """
WITH p AS (SELECT event_id AS purchase_id, user_id, {epoch_us} AS t
           FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, {epoch_us} AS t
      FROM events WHERE event_type = 'view'),
j AS (SELECT p.purchase_id, p.user_id, count(v.t) AS n_touches
      FROM p LEFT JOIN v
        ON p.user_id = v.user_id
       AND v.t < p.t AND v.t >= p.t - 604800000000
      GROUP BY p.purchase_id, p.user_id)
SELECT purchase_id, user_id, n_touches,
       CASE WHEN n_touches > 0
            THEN CAST(round(1.0 / n_touches, 6) AS DOUBLE)
            ELSE CAST(NULL AS DOUBLE) END AS credit_per_touch
FROM j
"""

register_sql(
    "attribution_linear",
    spark_sql=_ATTRIBUTION.format(epoch_us="unix_micros(CAST(ts AS TIMESTAMP))"),
    duck_sql=_ATTRIBUTION.format(epoch_us="epoch_us(ts)"),
)


# --------------------------------------------------------------------------
# Rolling 7-day distinct active users — exact windowed distinct, which
# no sliding-window agg gives directly (distinct doesn't decompose).
# Scale plan: dedup to (day, user) pairs first (the big shuffle, but
# on already-partial-aggregated data), then explode each pair into the
# 7 trailing days it keeps alive — a fixed 7× fan-out BEFORE the final
# count-distinct shuffle. No day×pair range join, no nested loop; at
# 100 TB the fan-out constant beats a non-equi join by construction.
# The HLL path (hll_daily_users) is the sketch alternative when exact
# isn't required.

_ROLLING_DAU = """
WITH du AS (SELECT DISTINCT
              CAST({epoch_us} {div} 86400000000 AS BIGINT) AS day_no,
              user_id
            FROM events),
days AS (SELECT DISTINCT day_no FROM du),
x AS (SELECT du.day_no + k.k AS day_no, du.user_id
      FROM du CROSS JOIN ({offsets}) k)
SELECT x.day_no, count(DISTINCT x.user_id) AS active_users_7d
FROM x JOIN days d ON x.day_no = d.day_no
GROUP BY x.day_no
"""

register_sql(
    "rolling_7d_distinct_users",
    spark_sql=_ROLLING_DAU.format(
        epoch_us="unix_micros(CAST(ts AS TIMESTAMP))",
        div="div",
        offsets="SELECT explode(sequence(0, 6)) AS k",
    ),
    duck_sql=_ROLLING_DAU.format(
        epoch_us="epoch_us(ts)", div="//", offsets="SELECT unnest(range(0, 7)) AS k"
    ),
)


# --------------------------------------------------------------------------
# Per-user behavioral entropy — Shannon entropy (bits) of each user's
# event-type mix: 0 for single-minded users, log2(5) for uniform ones.
# Two partial-aggregated groupBys + a user-keyed join; the per-term
# p·log2(p) math is pure JVM column arithmetic.

_BEHAVIOR_ENTROPY = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
SELECT c.user_id,
       CAST(max(t.tot) AS BIGINT) AS n_events,
       CAST(round(-sum((c.n / t.tot) * log2(c.n / t.tot)), 6) AS DOUBLE)
         AS entropy_bits
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
"""

register_sql("behavior_entropy", _BEHAVIOR_ENTROPY)


# --------------------------------------------------------------------------
# Shipping-delay distribution — order date to line-item ship date in
# days, summarized per order priority: the TPC-H-flavored latency SLA
# query. One fact-fact equi join (orders broadcast-eligible at small
# SF, sort-merge at scale) + one partial-aggregated groupBy; datediff
# truncates both sides to dates identically on both engines.

_SHIP_DELAY = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       CAST(round(avg({delay}), 6) AS DOUBLE) AS avg_delay_days,
       CAST(round({median_delay}, 6) AS DOUBLE) AS p50_delay_days,
       max({delay}) AS max_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

register_sql(
    "ship_delay_stats",
    spark_sql=_SHIP_DELAY.format(
        delay="datediff(l_shipdate, o_orderdate)",
        median_delay="percentile(datediff(l_shipdate, o_orderdate), 0.5)",
    ),
    duck_sql=_SHIP_DELAY.format(
        delay="date_diff('day', o_orderdate, l_shipdate)",
        median_delay="quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.5)",
    ),
)


# --------------------------------------------------------------------------
# Readability profile — per-language corpus readability: sentences per
# doc (terminator runs), words per sentence, chars per word — the
# quality-gating signals a curation pipeline thresholds on (long
# run-on sentences and very long "words" both flag extraction junk).
# Pure per-row regex + one aggregation; the regexes are shared RE2/Java
# syntax (no lookaround).

_READABILITY = """
WITH d AS (
  SELECT lang,
         greatest({n_sents}, 1) AS n_sents,
         {n_words} AS n_words,
         {n_word_chars} AS n_word_chars
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(round(avg(CAST(n_words AS DOUBLE) / n_sents), 6) AS DOUBLE)
         AS words_per_sentence,
       CAST(round(avg(CAST(n_word_chars AS DOUBLE) / greatest(n_words, 1)), 6)
            AS DOUBLE) AS chars_per_word
FROM d GROUP BY lang
"""

register_sql(
    "readability",
    spark_sql=_READABILITY.format(
        n_sents="regexp_count(text, '[.!?]+')",
        n_words="size(split(trim(text), '\\\\s+'))",
        n_word_chars="length(regexp_replace(text, '\\\\s+', ''))",
    ),
    duck_sql=_READABILITY.format(
        n_sents="len(regexp_extract_all(text, '[.!?]+'))",
        n_words="len(string_split_regex(trim(text), '\\s+'))",
        n_word_chars="length(regexp_replace(text, '\\s+', '', 'g'))",
    ),
)


# --------------------------------------------------------------------------
# Session duration profile — corpus-level session statistics on top of
# the 30-minute-gap sessionization (same islands construction as
# q:sessionize): session count, duration quantiles, events/session.
# The per-(user, session) agg is partial-combined; only the final
# single-row summary crosses the last shuffle.

_SESSION_DURATION = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN {gap_sec} IS NULL OR {gap_sec} > 1800 THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (SELECT user_id, event_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY event_id) AS sess_id
      FROM g),
d AS (SELECT user_id, sess_id, count(*) AS n_events,
             ({max_us} - {min_us}) / 1000000.0 AS dur_sec
      FROM s GROUP BY user_id, sess_id)
SELECT count(*) AS n_sessions,
       CAST(round(avg(dur_sec), 6) AS DOUBLE) AS avg_duration_sec,
       CAST(round({p50}, 6) AS DOUBLE) AS p50_duration_sec,
       CAST(round(avg(CAST(n_events AS DOUBLE)), 6) AS DOUBLE)
         AS avg_events_per_session
FROM d
"""

register_sql(
    "session_duration_stats",
    spark_sql=_SESSION_DURATION.format(
        gap_sec="(unix_micros(CAST(ts AS TIMESTAMP))"
        " - unix_micros(CAST(lag(ts) OVER (PARTITION BY user_id"
        " ORDER BY event_id) AS TIMESTAMP))) / 1000000.0",
        max_us="unix_micros(CAST(max(ts) AS TIMESTAMP))",
        min_us="unix_micros(CAST(min(ts) AS TIMESTAMP))",
        p50="percentile(dur_sec, 0.5)",
    ),
    duck_sql=_SESSION_DURATION.format(
        # fractional seconds, matching Spark's unix_micros delta exactly
        # — date_diff('second') counts integer boundary crossings and
        # can classify a (1800s, 1801s) gap differently (ADVICE r1)
        gap_sec="(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id"
        " ORDER BY event_id))) / 1000000.0",
        max_us="epoch_us(max(ts))",
        min_us="epoch_us(min(ts))",
        p50="quantile_cont(dur_sec, 0.5)",
    ),
)


# --------------------------------------------------------------------------
# New vs returning — per day, activity split by whether it's each
# user's first-ever day: the top-of-dashboard growth metric. One
# first-day agg + one user-keyed join; the conditional distinct counts
# share the same shuffle.

_NEW_VS_RETURNING = """
WITH e AS (SELECT user_id, CAST({epoch_us} {div} 86400000000 AS BIGINT) AS day_no
           FROM events),
f AS (SELECT user_id, min(day_no) AS first_day FROM e GROUP BY user_id)
SELECT e.day_no,
       CAST(sum(CASE WHEN e.day_no = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_events,
       CAST(sum(CASE WHEN e.day_no > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_events,
       count(DISTINCT CASE WHEN e.day_no = f.first_day THEN e.user_id END)
         AS new_users,
       count(DISTINCT CASE WHEN e.day_no > f.first_day THEN e.user_id END)
         AS returning_users
FROM e JOIN f ON e.user_id = f.user_id
GROUP BY e.day_no
"""

register_sql(
    "new_vs_returning",
    spark_sql=_NEW_VS_RETURNING.format(
        epoch_us="unix_micros(CAST(ts AS TIMESTAMP))", div="div"
    ),
    duck_sql=_NEW_VS_RETURNING.format(epoch_us="epoch_us(ts)", div="//"),
)


# --------------------------------------------------------------------------
# Strict 3-step funnel — view → click → purchase, each step within 30
# minutes of the previous, earliest-completion semantics: for every
# view, the FIRST click after it, then the FIRST purchase after that
# click. Two as-of-style joins expressed as min-over-candidates; both
# ride the user_id equi key with the time band as residual, so the
# plan stays a keyed hash/sort-merge chain (no nested loop) and
# per-key fan-out is one user's history.

_FUNNEL3 = """
WITH e AS (SELECT user_id, event_type, {epoch_us} AS t FROM events),
v AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
c AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
vc AS (SELECT v.user_id, v.t AS v_t, min(c.t) AS c_t
       FROM v JOIN c ON v.user_id = c.user_id
                     AND c.t > v.t AND c.t <= v.t + 1800000000
       GROUP BY v.user_id, v.t),
vcp AS (SELECT vc.user_id, vc.v_t, vc.c_t, min(p.t) AS p_t
        FROM vc JOIN p ON vc.user_id = p.user_id
                       AND p.t > vc.c_t AND p.t <= vc.c_t + 1800000000
        GROUP BY vc.user_id, vc.v_t, vc.c_t)
SELECT (SELECT count(*) FROM v) AS n_views,
       (SELECT count(*) FROM vc) AS n_view_click,
       (SELECT count(*) FROM vcp) AS n_view_click_purchase,
       (SELECT count(DISTINCT user_id) FROM vcp) AS n_converted_users
"""

register_sql(
    "funnel_3step",
    spark_sql=_FUNNEL3.format(epoch_us="unix_micros(CAST(ts AS TIMESTAMP))"),
    duck_sql=_FUNNEL3.format(epoch_us="epoch_us(ts)"),
)


# --------------------------------------------------------------------------
# Transition dwell times — how long users linger between consecutive
# event types (the edge-weighted companion of markov_transitions):
# per (prev_type, next_type), transition count and mean/median dwell
# seconds. One per-user window pass (lag), one grouped agg.

_TRANSITION_DWELL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev_type,
         ({t} - lag({t}) OVER (PARTITION BY user_id ORDER BY event_id))
           / 1000000.0 AS dwell_sec
  FROM events
)
SELECT prev_type, event_type AS next_type,
       count(*) AS n_transitions,
       CAST(round(avg(dwell_sec), 6) AS DOUBLE) AS avg_dwell_sec,
       CAST(round({p50}, 6) AS DOUBLE) AS p50_dwell_sec
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""

register_sql(
    "transition_dwell",
    spark_sql=_TRANSITION_DWELL.format(
        t="unix_micros(CAST(ts AS TIMESTAMP))",
        p50="percentile(dwell_sec, 0.5)",
    ),
    duck_sql=_TRANSITION_DWELL.format(
        t="epoch_us(ts)", p50="quantile_cont(dwell_sec, 0.5)"
    ),
)


# --------------------------------------------------------------------------
# Power-user concentration — decile shares of activity by per-user
# total value (the Pareto/"whale" curve). Ordering ties break on
# (rounded value, user_id) for cross-engine determinism. The Spark
# side computes the EXACT global ntile via the two-phase bucketed rank
# (operators/mixing.py) instead of `ntile() OVER (ORDER BY …)`: the
# per-user rollup grows with the data (10^9 users at web scale), and a
# global window would drag it all through one task. ntile_expr derives
# exact ANSI NTILE (front-loaded tile sizes) from (pos, total).

_POWER_USER = """
WITH u AS (SELECT user_id, count(*) AS n_events,
                  CAST(round(sum(value), 6) AS DOUBLE) AS total_value
           FROM events GROUP BY user_id),
t AS (SELECT CAST(round(sum(total_value), 6) AS DOUBLE) AS grand FROM u),
d AS (SELECT user_id, n_events, total_value,
             ntile(10) OVER (ORDER BY total_value DESC, user_id) AS decile
      FROM u)
SELECT decile, count(*) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(round(sum(total_value), 6) AS DOUBLE) AS value_sum,
       CAST(round(sum(total_value) / max(t.grand), 6) AS DOUBLE) AS value_share
FROM d CROSS JOIN t
GROUP BY decile
"""


@register("power_user_share", oracle=_POWER_USER)
def q_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_ms_spark.operators.mixing import bucketed_global_rank, ntile_expr

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).cast("double").alias("total_value"),
    )
    # bucket ascends along the (total_value DESC) order: -floor(v)
    ranked = bucketed_global_rank(
        u,
        bucket=(-F.floor("total_value")).cast("long"),
        order_cols=[F.col("total_value").desc(), F.col("user_id").asc()],
    )
    d = ranked.withColumn("decile", ntile_expr(10))
    grand = u.agg(
        F.round(F.sum("total_value"), 6).cast("double").alias("grand")
    )
    per = d.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("total_value").alias("_raw"),
    )
    return per.crossJoin(grand).select(
        "decile",
        "n_users",
        "n_events",
        F.round("_raw", 6).cast("double").alias("value_sum"),
        F.round(F.col("_raw") / F.col("grand"), 6).cast("double").alias(
            "value_share"
        ),
    )


# --------------------------------------------------------------------------
# Day-of-week seasonality — the weekly activity heatmap per event
# type. ISO day numbering on both engines (Spark weekday() is
# 0=Monday, DuckDB isodow() is 1=Monday — offset aligned here).

_DOW = """
SELECT event_type, {dow} AS iso_dow, count(*) AS n_events,
       CAST(round(avg(value), 6) AS DOUBLE) AS avg_value,
       CAST(round(sum(value), 6) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type, {dow}
"""

register_sql(
    "dow_seasonality",
    spark_sql=_DOW.format(dow="weekday(CAST(ts AS TIMESTAMP)) + 1"),
    duck_sql=_DOW.format(dow="isodow(ts)"),
)


# --------------------------------------------------------------------------
# Order backlog — the running-balance pattern: orders placed minus
# orders fully shipped (every lineitem shipped), cumulated over a day
# spine. Two partial-aggregated daily streams diffed by a cumulative
# window over the DAY series — the global sort touches one row per
# day, never fact rows.

_BACKLOG = """
WITH placed AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_placed
                FROM orders GROUP BY 1),
done AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS done_day
         FROM lineitem GROUP BY l_orderkey),
shipped AS (SELECT done_day AS day, count(*) AS n_done FROM done GROUP BY 1),
days AS (SELECT day FROM placed UNION SELECT day FROM shipped),
j AS (SELECT d.day,
             coalesce(p.n_placed, 0) AS n_placed,
             coalesce(s.n_done, 0) AS n_done
      FROM days d
      LEFT JOIN placed p ON d.day = p.day
      LEFT JOIN shipped s ON d.day = s.day)
SELECT day, n_placed, n_done,
       CAST(sum(n_placed - n_done)
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS open_backlog
FROM j
"""

register_sql("order_backlog", _BACKLOG)


# --------------------------------------------------------------------------
# Month-over-month growth — revenue deltas as percentages via lag over
# the month series (rounded revenue on both sides BEFORE the ratio so
# the percentage can't diverge cross-engine).

_MOM = """
WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue
           FROM orders GROUP BY 1)
SELECT month, revenue,
       CAST(round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
                  / lag(revenue) OVER (ORDER BY month), 6) AS DOUBLE)
         AS mom_pct
FROM m
"""

register_sql("mom_growth", _MOM)


# --------------------------------------------------------------------------
# Brand return rates — lineitem returnflag share per part brand: the
# product-quality slice. One fact-dim equi join (part broadcasts) +
# one partial-aggregated groupBy; the rate is computed sum/count to
# keep every literal DOUBLE (bare 1.0 would be DECIMAL — oracle
# poison).

_BRAND_RETURNS = """
SELECT p_brand,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*), 6) AS DOUBLE) AS return_rate,
       CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice
                           ELSE CAST(0 AS DOUBLE) END), 2) AS DOUBLE)
         AS returned_value
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

register_sql("brand_return_rate", _BRAND_RETURNS)


# --------------------------------------------------------------------------
# Zipf slope — rank-frequency log-log regression over the top-1000
# vocabulary terms (natural corpora fit slope ≈ -1; a far-off slope
# flags synthetic or degenerate text). regr_slope/regr_r2 are shared
# SQL aggregates; the rank window's `rnk <= 1000` filter triggers
# Spark's WindowGroupLimit pushdown, so the sort is top-k over the
# vocabulary, not a full-vocab materialization.

_ZIPF = """
WITH toks AS (SELECT {tokens} AS term FROM documents),
f AS (SELECT term, count(*) AS freq FROM toks WHERE term <> ''
      GROUP BY term),
r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rnk
      FROM f),
t AS (SELECT ln(CAST(rnk AS DOUBLE)) AS lx, ln(CAST(freq AS DOUBLE)) AS ly
      FROM r WHERE rnk <= 1000)
SELECT count(*) AS n_terms,
       CAST(round(regr_slope(ly, lx), 6) AS DOUBLE) AS zipf_slope,
       CAST(round(regr_r2(ly, lx), 6) AS DOUBLE) AS r2
FROM t
"""

register_sql(
    "zipf_slope",
    spark_sql=_ZIPF.format(
        tokens="explode(split(lower(text), '[^a-z]+'))"
    ),
    duck_sql=_ZIPF.format(
        tokens="unnest(string_split_regex(lower(text), '[^a-z]+'))"
    ),
)


# --------------------------------------------------------------------------
# Benford first-digit audit — the classic fabricated-data screen for a
# positive, scale-spanning measure (order totals). First digit is
# taken from the INTEGER cents string (round(x*100) -> BIGINT ->
# substr), never from float log10 math or float-to-string rendering,
# both of which differ across engines at boundaries. One scan + a
# 9-row rollup; expected shares are closed-form log10(1 + 1/d).

_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
  CAST(round(count(*) / CAST((SELECT count(*) FROM d) AS DOUBLE), 6) AS DOUBLE)
    AS obs_share,
  CAST(round(log10(1.0 + 1.0 / digit), 6) AS DOUBLE) AS benford_share
FROM d GROUP BY digit
"""


@register("benford_audit", oracle=_BENFORD_ORACLE)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation log10(1 + 1/d)."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("t"))  # 9-row input
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("t"), 6).alias("obs_share"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_share"),
    )


# --------------------------------------------------------------------------
# lang x source independence audit — the contingency table + per-cell
# chi-square contribution that tells a curation run whether corpus
# composition shifted (a source suddenly dominating one language).
# Expected counts are exact integer-ratio doubles (identical IEEE on
# both engines); contributions are rounded at 6 dp only on output.
# Scale: one |langs|x|sources| rollup plus two broadcast marginals.

_CHI2_ORACLE = """
WITH cell AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
rowm AS (SELECT lang, sum(n) AS rn FROM cell GROUP BY lang),
colm AS (SELECT source, sum(n) AS cn FROM cell GROUP BY source),
tot AS (SELECT sum(n) AS t FROM cell)
SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n,
  CAST(round(rn * cn / CAST(t AS DOUBLE), 6) AS DOUBLE) AS expected,
  CAST(round(pow(c.n - rn * cn / CAST(t AS DOUBLE), 2)
             / (rn * cn / CAST(t AS DOUBLE)), 6) AS DOUBLE) AS chi2_contrib
FROM cell c JOIN rowm USING (lang) JOIN colm USING (source) CROSS JOIN tot
"""


@register("lang_source_chi2", oracle=_CHI2_ORACLE)
def q_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table of lang x source with expected counts and
    per-cell chi-square contributions."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    rowm = cell.groupBy("lang").agg(F.sum("n").alias("rn"))
    colm = cell.groupBy("source").agg(F.sum("n").alias("cn"))
    tot = cell.agg(F.sum("n").cast("double").alias("t"))
    e = F.col("rn") * F.col("cn") / F.col("t")
    return (
        cell.join(F.broadcast(rowm), "lang")
        .join(F.broadcast(colm), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.col("n").cast("long").alias("n"),
            F.round(e, 6).alias("expected"),
            F.round(F.pow(F.col("n") - e, 2) / e, 6).alias("chi2_contrib"),
        )
    )


# --------------------------------------------------------------------------
# Join-key skew census — the audit run BEFORE picking a shuffle
# strategy for a 100 TB join: the 20 hottest keys with their row share
# and the share of the single hottest key. Top-k goes through
# sort+limit (TakeOrdered partial top-k on every partition — never a
# global rank window); the total rides a broadcast one-row aggregate.
# If hot_share x rows-per-reducer exceeds executor memory, the join
# needs `salted_join` (partitioning.py) or AQE skew splitting.

_KEY_SKEW_ORACLE = """
WITH k AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
tot AS (SELECT sum(n) AS t, max(n) AS hot FROM k)
SELECT user_id, CAST(n AS BIGINT) AS n,
  CAST(round(n / CAST(t AS DOUBLE), 6) AS DOUBLE) AS share,
  CAST(round(hot / CAST(t AS DOUBLE), 6) AS DOUBLE) AS hot_share
FROM k CROSS JOIN tot
ORDER BY n DESC, user_id LIMIT 20
"""


@register("key_skew_report", oracle=_KEY_SKEW_ORACLE)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest event join keys with row share and the global
    hottest-key share — the pre-join skew diagnosis."""
    events = load_table(spark, sf_dir, "events")
    k = events.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = k.agg(
        F.sum("n").cast("double").alias("t"), F.max("n").alias("hot")
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
            F.round(F.col("hot") / F.col("t"), 6).alias("hot_share"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Salted skew join (round 10) — the execution-side answer to
# `key_skew_report`'s diagnosis: a user-cohort dim (first-seen day per
# user) joined back to the full event log with an 8-way deterministic
# salt (operators/skewjoin.py — fact rows salted by xxhash64(event_id),
# dim rows replicated 8×, join on (user_id, _salt)), then a per-cohort
# rollup. Match-for-match identical to the plain join — the oracle IS
# the plain join — while a Zipf-hot user's rows span 8 tasks instead
# of one. At local scale the win is invisible; the operator, the
# deterministic-salt construction, and the result-parity pin are what
# ship to the cluster.

_SALTED_JOIN_ORACLE = """
WITH dim AS (SELECT user_id,
                    min(epoch_us(ts) // 86400000000) AS first_day
             FROM events GROUP BY user_id)
SELECT first_day,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(round(sum(value), 6) AS DOUBLE) AS sum_value
FROM events e JOIN dim USING (user_id)
GROUP BY first_day
ORDER BY first_day
"""


@register("skew_salted_join", oracle=_SALTED_JOIN_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-day cohort rollup via an 8-way salted join."""
    from flink_ms_spark.operators.skewjoin import salted_join

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "value",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day_no"),
    )
    dim = ev.groupBy("user_id").agg(F.min("day_no").alias("first_day"))
    joined = salted_join(
        ev, dim, on="user_id", n_salts=8,
        salt_expr=F.xxhash64("event_id"),
    )
    return (
        joined.groupBy("first_day")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("first_day")
    )
