"""General relational coverage (SURVEY.md §2.9): the reference has no
SQL layer; the Spark engine exposes the full relational surface
natively via Spark SQL. These queries pin scan/filter/join/agg/window/
rollup/set-op/limit semantics against the DuckDB oracle on the
TPC-H-ish fixture tables.

Most SQL is dialect-shared (one string for both engines). Float
aggregates are rounded on both sides; money sums round(2), averages
round(6), stddev round(4) (different accumulation algorithms).
"""

from __future__ import annotations

from flink_ms_spark.plans.registry import register_sql

# --------------------------------------------------------------------------
# Exact integer money arithmetic (dialect-shared SQL fragments).
#
# Every money column in the fixture is an exact 2-dp value (verified:
# max |x*100 - round(x*100)| < 4e-9 at sf0.1 for *price/*acctbal, and
# l_discount/l_tax are 2-dp ratios), so round(x*100) -> BIGINT is
# exact per row. Integer sums are order-independent, so ONE final
# double division + ONE round is bit-deterministic on both engines —
# unlike round(float-agg, d), whose accumulation-order error (~1e-5 on
# 1e9-magnitude sums) can cross a rounding boundary and flip the gate
# hash run-to-run (the r4 `rfm_segments` red row; see VERDICT.md r4).
#
# Scale envelope: the 6-dp charge basis is ≤ ~1.2e11 per row, so a
# BIGINT sum is exact to ~8e7 rows per group; the DECIMAL(38,0) cast
# inside sum() lifts that to 1e38 (Spark sums decimals exactly; DuckDB
# sums BIGINT into HUGEINT natively), keeping the plan overflow-proof
# at cluster scale while per-row math stays in fast BIGINT.
_EXT_CENTS = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_DISC_BP = "CAST(round(l_discount * 100, 0) AS BIGINT)"
_TAX_BP = "CAST(round(l_tax * 100, 0) AS BIGINT)"
# l_extendedprice * (1 - l_discount), scaled by 1e4 (exact integer)
_REV_BASIS = f"CAST({_EXT_CENTS} * (100 - {_DISC_BP}) AS DECIMAL(38,0))"
# l_extendedprice * (1 - l_discount) * (1 + l_tax), scaled by 1e6
_CHARGE_BASIS = (
    f"CAST({_EXT_CENTS} * (100 - {_DISC_BP}) * (100 + {_TAX_BP}) AS DECIMAL(38,0))"
)
# l_extendedprice * l_discount, scaled by 1e4 (exact integer)
_DISC_REV_BASIS = f"CAST({_EXT_CENTS} * {_DISC_BP} AS DECIMAL(38,0))"


def money_cents(col: str) -> str:
    """Exact integer cents for a 2-dp money column (both dialects)."""
    return f"CAST(round({col} * 100, 0) AS BIGINT)"


# TPC-H Q1 flavor — pricing summary
register_sql(
    "pricing_summary",
    spark_sql=f"""
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum({_EXT_CENTS}) / 100.0, 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum({_CHARGE_BASIS}) / 1000000.0, 2) AS DOUBLE) AS sum_charge,
  CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
  CAST(round(sum({_EXT_CENTS}) / (count(*) * 100.0), 6) AS DOUBLE) AS avg_price,
  CAST(round(sum({_DISC_BP}) / (count(*) * 100.0), 6) AS DOUBLE) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    duck_sql=None,  # set below — only the literal type differs
)
# DuckDB has no TIMESTAMP_NTZ keyword; its TIMESTAMP is already naive
from flink_ms_spark.plans.registry import ORACLE_SQL  # noqa: E402

ORACLE_SQL["pricing_summary"] = ORACLE_SQL["pricing_summary"].replace(
    "TIMESTAMP_NTZ '1998-09-02 00:00:00'", "TIMESTAMP '1998-09-02 00:00:00'"
)

# Q3 flavor — revenue per customer, top 10 (deterministic tie-break)
register_sql(
    "top_customers",
    """
SELECT c_custkey, c_name,
  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
""",
)

# Q5 flavor — 5-way join, revenue per region.
#
# JOIN ORDER RULE (r14, applied to every multi-join query here): the
# FACT table (lineitem, else orders) is written FIRST. Catalyst keeps
# the written left-deep order without CBO stats, so a dims-first text
# put the fact table on the BUILD side of every broadcast join — the
# r14 plan audit caught region_revenue building a 600k-row broadcast
# hash relation of lineitem on the driver while streaming the 5-row
# region table. Fact-first streams the big side and broadcasts the
# dims (the scale-correct shape; at 100 TB the same order degrades to
# sort-merge joins keyed on the fact's join key, never to a broadcast
# of the fact). Inner joins commute, so results are unchanged (all
# rewritten queries re-verified against their DuckDB oracles).
register_sql(
    "region_revenue",
    f"""
SELECT r_name,
  CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS revenue
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)

# Q4 flavor — EXISTS correlated subquery
register_sql(
    "order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
)

# window: top-3 customers by balance per nation
register_sql(
    "window_rank",
    """
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
    CAST(row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
  FROM customer) t
WHERE rk <= 3
""",
)

# window: per-user event value deltas (lag)
register_sql(
    "window_lag",
    """
SELECT user_id, event_id,
  CAST(round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
       AS DOUBLE) AS delta
FROM events
""",
)

# rollup
register_sql(
    "rollup_orders",
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)

# cube
register_sql(
    "cube_lineitem",
    """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)

# distinct
register_sql("distinct_segments", "SELECT DISTINCT c_mktsegment FROM customer")

# order+limit top-k (exact values, deterministic tie-break)
register_sql(
    "topk_orders",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)

# anti join
register_sql(
    "customers_without_orders",
    """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)

# semi join via IN subquery
register_sql(
    "orders_building_segment",
    """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)

# JSON extraction (dialect-split)
register_sql(
    "events_json",
    spark_sql=(
        "SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k FROM events"
    ),
    duck_sql=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events"
    ),
)

# conditional aggregation
register_sql(
    "case_agg",
    """
SELECT event_type,
  CAST(round(sum(CASE WHEN value > 100 THEN value ELSE CAST(0 AS DOUBLE) END), 2)
       AS DOUBLE) AS big_sum,
  count(CASE WHEN value > 100 THEN 1 END) AS n_big
FROM events GROUP BY event_type
""",
)

# date functions: monthly revenue
register_sql(
    "monthly_revenue",
    """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
  CAST(year(o_orderdate) AS INT) AS yr,
  count(*) AS n,
  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
FROM orders GROUP BY 1, 2
""",
)

# stats aggregates
register_sql(
    "value_stats",
    """
SELECT event_type,
  CAST(round(stddev_samp(value), 4) AS DOUBLE) AS sd,
  CAST(round(var_samp(value), 2) AS DOUBLE) AS var,
  CAST(round(min(value), 2) AS DOUBLE) AS mn,
  CAST(round(max(value), 2) AS DOUBLE) AS mx
FROM events GROUP BY event_type
""",
)

# string functions
register_sql(
    "string_funcs",
    """
SELECT p_partkey, upper(p_brand) AS brand_u,
  substr(p_name, 1, 10) AS name_prefix,
  CAST(length(p_name) AS INT) AS name_len,
  replace(p_type, ' ', '_') AS type_u
FROM part
""",
)

# set operations
register_sql(
    "nations_with_both",
    """
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)

# having
register_sql(
    "big_orders",
    """
SELECT l_orderkey, CAST(round(sum(l_quantity), 2) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 100
""",
)

# manual pivot via conditional agg (portable across dialects)
register_sql(
    "status_pivot",
    """
SELECT o_orderpriority,
  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders GROUP BY o_orderpriority
""",
)

# Q4 flavor — EXISTS semi-join: priority counts of orders with a
# discounted line
register_sql(
    "exists_discounted",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
""",
)

# Q17 flavor — correlated scalar subquery: revenue of small-quantity
# lines relative to the per-part average
register_sql(
    "part_small_qty",
    """
SELECT l.l_partkey,
  CAST(round(sum(l.l_extendedprice), 2) AS DOUBLE) AS small_qty_revenue
FROM lineitem l
WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey
""",
)

# set ops — INTERSECT / EXCEPT (distinct semantics on both engines)
register_sql(
    "nations_intersect",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)

register_sql(
    "nations_except",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
)

# Q18 flavor — HAVING over a join aggregate
register_sql(
    "big_order_customers",
    """
SELECT c_custkey, o_orderkey,
  CAST(round(sum(l_quantity), 2) AS DOUBLE) AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, o_orderkey
HAVING sum(l_quantity) > 250
""",
)

# Sessionization — 30-minute-gap sessions per user over the event
# stream (gaps-and-islands: lag + cumulative sum). The fixture `ts` is
# a micros TIMESTAMP on both engines; only the gap expression differs
# (Spark: unix_micros delta, DuckDB: date_diff).
_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id,
    CASE WHEN {gap_sec} > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (
  SELECT user_id,
    sum(new_session) OVER (PARTITION BY user_id
                           ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g)
SELECT user_id, count(DISTINCT session_no) + 0 AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id
"""
register_sql(
    "sessionize",
    spark_sql=_SESSIONIZE.format(
        gap_sec="(unix_micros(CAST(ts AS TIMESTAMP))"
        " - unix_micros(CAST(lag(ts) OVER (PARTITION BY user_id"
        " ORDER BY event_id) AS TIMESTAMP))) / 1000000.0"
    ),
    duck_sql=_SESSIONIZE.format(
        # fractional seconds, matching Spark's unix_micros delta exactly
        # (integer date_diff can flip on sub-second alignment, ADVICE r1)
        gap_sec="(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id"
        " ORDER BY event_id))) / 1000000.0"
    ),
)

# Time-series correlation — align two users' event-value series by
# per-user sequence number, Pearson correlation per pair (the
# distributed form of series-similarity search: alignment is a keyed
# equi-join, correlation a single-pass aggregate)
register_sql(
    "series_correlation",
    """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq
  FROM events),
p AS (SELECT a.user_id AS ua, b.user_id AS ub, a.value AS va, b.value AS vb
      FROM s a JOIN s b ON b.user_id = a.user_id + 100 AND b.seq = a.seq)
SELECT ua, ub, CAST(round(corr(va, vb), 6) AS DOUBLE) AS corr_ab,
       count(*) AS n
FROM p GROUP BY ua, ub
HAVING count(*) >= 5
""",
)

# explicit GROUPING SETS (beyond rollup/cube)
register_sql(
    "grouping_sets_customer",
    """
SELECT c_mktsegment, c_nationkey, count(*) AS n,
       CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
""",
)

# correlated LATERAL subquery — per-nation top-2 customers
register_sql(
    "lateral_top_customers",
    """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
""",
)

# recursive CTE (Spark 4.x) — month spine joined to order counts
register_sql(
    "recursive_month_spine",
    """
WITH RECURSIVE m(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM m WHERE n < 12)
SELECT m.n AS mon, count(o_orderkey) AS n_orders
FROM m LEFT JOIN orders ON month(o_orderdate) = m.n
GROUP BY m.n
""",
)

# UNPIVOT — wide per-segment stats to long (metric, value) form
register_sql(
    "unpivot_segment_stats",
    """
WITH agg AS (
  SELECT c_mktsegment,
         CAST(round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                    / (count(*) * 100.0), 6) AS DOUBLE) AS avg_bal,
         CAST(round(min(c_acctbal), 6) AS DOUBLE) AS min_bal,
         CAST(round(max(c_acctbal), 6) AS DOUBLE) AS max_bal
  FROM customer GROUP BY c_mktsegment)
SELECT * FROM agg
UNPIVOT (v FOR metric IN (avg_bal, min_bal, max_bal))
""",
)

# native session_window (Spark built-in) vs gaps-and-islands oracle:
# per-user 30-minute-gap sessions with event counts and bounds
register_sql(
    "session_window_agg",
    spark_sql="""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events)
SELECT user_id, session_window.start AS session_start, count(*) AS n_events
FROM e GROUP BY user_id, session_window(t, '30 minutes')
""",
    duck_sql="""
WITH e AS (SELECT user_id, ts AS t, event_id FROM events),
g AS (SELECT user_id, t,
        -- fractional gap, >= : Spark merges events only while the next
        -- start is strictly inside [prev, prev+gap), so a gap of
        -- exactly 1800s (or 1800.5s — integer date_diff would say
        -- 1800) starts a NEW session
        CASE WHEN (epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id
                     ORDER BY t, event_id))) / 1000000.0 >= 1800
             THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, t,
        sum(brk) OVER (PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
SELECT user_id, min(t) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
)

# TPC-H Q7 flavor — volume shipping between two nations, by year
register_sql(
    "volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)

# TPC-H Q8 flavor — one nation's market share inside a region, by year
register_sql(
    "market_share",
    """
SELECT o_year,
  CAST(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                      ELSE CAST(0 AS DOUBLE) END) / sum(volume), 6) AS DOUBLE)
    AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)

# TPC-H Q14 flavor — promo revenue share for one month
register_sql(
    "promo_revenue",
    spark_sql=f"""
SELECT CAST(round(
  CAST(100 AS DOUBLE) *
    sum(CASE WHEN p_type = 'PROMO' THEN {_REV_BASIS}
             ELSE CAST(0 AS DECIMAL(38,0)) END)
    / sum({_REV_BASIS}), 6) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP_NTZ '1997-02-01 00:00:00'
""",
)
ORACLE_SQL["promo_revenue"] = ORACLE_SQL["promo_revenue"].replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)

# TPC-H Q19 flavor — OR-of-brackets join predicate (brand/size/qty)
register_sql(
    "bracket_revenue",
    f"""
SELECT CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
""",
)

# TPC-H Q22 flavor — well-funded customers with no orders, per nation
# (scalar subquery threshold + anti-join; threshold rounded to 2dp on
# both engines so the cross-engine avg summation order can't flip
# membership at the boundary)
register_sql(
    "acctbal_no_orders",
    f"""
SELECT n_name, count(*) AS numcust,
       CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(round(sum({money_cents('c_acctbal')})
                                     / (count(*) * 100.0), 2) AS DOUBLE)
                   FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name
""",
)

# TPC-H Q3 flavor — top unshipped orders by revenue (fixture has no
# o_shippriority column, so the grouping is (orderkey, orderdate)).
# ORDER BY the ROUNDED revenue + key so the LIMIT-10 frontier can't
# flip on cross-engine ulp differences in summation order.
register_sql(
    "shipping_priority",
    spark_sql=f"""
SELECT l_orderkey, o_orderdate,
       CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP_NTZ '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP_NTZ '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
ORACLE_SQL["shipping_priority"] = ORACLE_SQL["shipping_priority"].replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)

# TPC-H Q6 flavor — forecasting revenue change (single tight scan+agg;
# at scale this is the pushdown poster child: both date bounds and the
# discount/quantity range reach the parquet reader as PushedFilters)
register_sql(
    "forecast_revenue",
    spark_sql=f"""
SELECT CAST(round(sum({_DISC_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'
  AND l_discount BETWEEN CAST(0.03 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(30 AS DOUBLE)
""",
)
ORACLE_SQL["forecast_revenue"] = ORACLE_SQL["forecast_revenue"].replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)

# TPC-H Q10 flavor — returned-item revenue per customer, top 20
register_sql(
    "returned_items",
    spark_sql=f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
ORACLE_SQL["returned_items"] = ORACLE_SQL["returned_items"].replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)

# TPC-H Q13 flavor — distribution of customers by order count
# (left join keeps zero-order customers; all-integer, exactly portable)
register_sql(
    "customer_orders_dist",
    """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)

# TPC-H Q15 flavor — top supplier by quarter revenue (CTE + scalar-max
# equality; both engines round to 2dp BEFORE the max comparison so the
# winner can't differ on summation order)
register_sql(
    "top_supplier",
    spark_sql=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum({_REV_BASIS}) / 10000.0, 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
)
ORACLE_SQL["top_supplier"] = ORACLE_SQL["top_supplier"].replace(
    "TIMESTAMP_NTZ", "TIMESTAMP"
)

# Rolling 7-day revenue — RANGE frame over a NUMERIC day index (both
# engines support integer range frames; interval frames are
# Spark-unsupported, so the portable form is also the scale-correct
# one: one shuffle for the daily rollup, one global sort for the
# window — at 100 TB you'd partition the window by month and stitch)
register_sql(
    "rolling_7d_revenue",
    spark_sql="""
WITH d AS (SELECT datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS day_no,
                  o_totalprice
           FROM orders),
g AS (SELECT day_no, CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS day_rev
      FROM d GROUP BY day_no)
SELECT day_no, day_rev,
       CAST(round(sum(day_rev) OVER (ORDER BY day_no
                                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
                  2) AS DOUBLE) AS rev_7d
FROM g ORDER BY day_no
""",
    duck_sql="""
WITH d AS (SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no,
                  o_totalprice
           FROM orders),
g AS (SELECT day_no, CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS day_rev
      FROM d GROUP BY day_no)
SELECT day_no, day_rev,
       CAST(round(sum(day_rev) OVER (ORDER BY day_no
                                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
                  2) AS DOUBLE) AS rev_7d
FROM g ORDER BY day_no
""",
)

# Quantile discretization — per-type decile binning via ntile over a
# TOTAL order (value + event_id tiebreak: ntile is only portable when
# the order is total; ties split arbitrarily otherwise)
register_sql(
    "value_deciles",
    """
WITH d AS (SELECT event_type, value,
                  ntile(10) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS decile
           FROM events)
SELECT event_type, decile, count(*) AS n,
       CAST(round(min(value), 6) AS DOUBLE) AS lo,
       CAST(round(max(value), 6) AS DOUBLE) AS hi
FROM d GROUP BY event_type, decile ORDER BY event_type, decile
""",
)

# arg-max aggregate — latest event per user WITHOUT a window sort:
# max_by over a composite orderable key (zero-padded ts||event_id so
# ties on timestamp break deterministically on BOTH engines). At scale
# this is one partial-aggregating shuffle vs the window form's full
# per-key sort — the preferred latest-per-key shape.
register_sql(
    "user_last_event",
    spark_sql="""
WITH e AS (SELECT user_id, event_type, value,
                  lpad(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING), 20, '0')
                    || lpad(CAST(event_id AS STRING), 12, '0') AS ok
           FROM events)
SELECT user_id,
       max_by(event_type, ok) AS last_type,
       CAST(round(max_by(value, ok), 6) AS DOUBLE) AS last_value,
       count(*) AS n_events
FROM e GROUP BY user_id ORDER BY user_id
""",
    duck_sql="""
WITH e AS (SELECT user_id, event_type, value,
                  lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                    || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
           FROM events)
SELECT user_id,
       max_by(event_type, ok) AS last_type,
       CAST(round(max_by(value, ok), 6) AS DOUBLE) AS last_value,
       count(*) AS n_events
FROM e GROUP BY user_id ORDER BY user_id
""",
)

# Per-language sorted distinct source list (set semantics made
# deterministic by sorting; collect_set order is not). Joined to a
# ';'-string: ARRAY output crashes the driver's pandas canonicalizer.
register_sql(
    "sources_per_lang",
    spark_sql="""
SELECT lang, array_join(array_sort(collect_set(source)), ';') AS sources,
       count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
""",
    duck_sql="""
SELECT lang, array_to_string(list_sort(list(DISTINCT source)), ';') AS sources,
       count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
""",
)

# Calendar spine + LOCF gap fill — daily revenue per event type over
# the full [min, max] day range, missing days carried forward (the
# time-series resampling shape: generated spine, left join, then
# last-non-null window). Spine generation is sequence()/
# generate_series on both engines; day arithmetic stays integer.
register_sql(
    "daily_value_locf",
    spark_sql="""
WITH e AS (SELECT event_type,
                  CAST((unix_micros(CAST(ts AS TIMESTAMP))) div 86400000000 AS BIGINT) AS day_no,
                  value
           FROM events),
bounds AS (SELECT min(day_no) AS lo, max(day_no) AS hi FROM e),
spine AS (SELECT t.event_type, s.day_no
          FROM (SELECT DISTINCT event_type FROM e) t
          CROSS JOIN (SELECT explode(sequence((SELECT lo FROM bounds),
                                              (SELECT hi FROM bounds))) AS day_no) s),
daily AS (SELECT event_type, day_no,
                 CAST(round(sum(value), 6) AS DOUBLE) AS day_value
          FROM e GROUP BY event_type, day_no)
SELECT event_type, day_no,
       CAST(coalesce(d.day_value,
              last(d.day_value, true) OVER (PARTITION BY event_type ORDER BY day_no
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              CAST(0 AS DOUBLE)) AS DOUBLE) AS filled_value,
       (d.day_value IS NULL) AS was_gap
FROM spine LEFT JOIN daily d USING (event_type, day_no)
ORDER BY event_type, day_no
""",
    duck_sql="""
WITH e AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day_no,
                  value
           FROM events),
bounds AS (SELECT min(day_no) AS lo, max(day_no) AS hi FROM e),
spine AS (SELECT t.event_type, s.day_no
          FROM (SELECT DISTINCT event_type FROM e) t
          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                                    (SELECT hi FROM bounds))) AS day_no) s),
daily AS (SELECT event_type, day_no,
                 CAST(round(sum(value), 6) AS DOUBLE) AS day_value
          FROM e GROUP BY event_type, day_no)
SELECT event_type, day_no,
       CAST(coalesce(d.day_value,
              last_value(d.day_value IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY day_no
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              CAST(0 AS DOUBLE)) AS DOUBLE) AS filled_value,
       (d.day_value IS NULL) AS was_gap
FROM spine LEFT JOIN daily d USING (event_type, day_no)
ORDER BY event_type, day_no
""",
)

# Session funnel — per user: views, purchases, and view→purchase
# conversions where a purchase follows a view within 30 minutes
# (EXISTS over a time band), rolled up to per-nation-independent
# corpus rates. Conversion test reuses the banded join shape.
register_sql(
    "funnel_conversion",
    spark_sql="""
WITH e AS (SELECT user_id, event_type, unix_micros(CAST(ts AS TIMESTAMP)) AS t FROM events),
v AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
conv AS (SELECT DISTINCT v.user_id, v.t
         FROM v JOIN p ON v.user_id = p.user_id
                      AND p.t > v.t AND p.t <= v.t + 1800000000)
SELECT (SELECT count(*) FROM v) AS n_views,
       (SELECT count(*) FROM p) AS n_purchases,
       (SELECT count(*) FROM conv) AS n_converting_views,
       CAST(round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
                  / (SELECT count(*) FROM v), 6) AS DOUBLE) AS view_conversion_rate
""",
    duck_sql="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
v AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
conv AS (SELECT DISTINCT v.user_id, v.t
         FROM v JOIN p ON v.user_id = p.user_id
                      AND p.t > v.t AND p.t <= v.t + 1800000000)
SELECT (SELECT count(*) FROM v) AS n_views,
       (SELECT count(*) FROM p) AS n_purchases,
       (SELECT count(*) FROM conv) AS n_converting_views,
       CAST(round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
                  / (SELECT count(*) FROM v), 6) AS DOUBLE) AS view_conversion_rate
""",
)

# Event-type co-occurrence with lift — market-basket pair counts over
# per-user distinct type sets (self-join a<b on user), lift =
# P(a,b)/(P(a)P(b)). All-integer counts + one rounded division.
register_sql(
    "event_cooccurrence",
    """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
m AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
          FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY a.event_type, b.event_type)
SELECT type_a, type_b, n_both,
       CAST(round(CAST(n_both AS DOUBLE) * n.n_users
                  / (ma.n_t * mb.n_t), 6) AS DOUBLE) AS lift
FROM pairs JOIN m ma ON pairs.type_a = ma.event_type
           JOIN m mb ON pairs.type_b = mb.event_type
           CROSS JOIN n
ORDER BY type_a, type_b
""",
)

# Gaps-and-islands: per-user runs of consecutive same event_type
# (SCD-style state intervals). Island id = global row_number minus
# per-(user, type) row_number — the classic two-window trick; run
# stats are integer-exact, avg is one division.
register_sql(
    "user_state_intervals",
    """
WITH o AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn_t
           FROM events),
runs AS (SELECT user_id, event_type, rn - rn_t AS grp, count(*) AS run_len
         FROM o GROUP BY user_id, event_type, rn - rn_t)
SELECT user_id, count(*) AS n_runs, max(run_len) AS max_run_len,
       CAST(round(avg(CAST(run_len AS DOUBLE)), 6) AS DOUBLE) AS avg_run_len
FROM runs GROUP BY user_id ORDER BY user_id
""",
)

# Z-score outliers — top-5 most extreme values per event type by
# |value - mean| / stddev. Ranking is monotone in |value - mean| for a
# fixed group, so cross-engine stddev accumulation differences cannot
# reorder it; z rounds to 4 dp in the output.
register_sql(
    "zscore_outliers",
    """
WITH s AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
           FROM events GROUP BY event_type),
scored AS (SELECT e.event_id, e.event_type, e.value,
                  (e.value - s.mu) / s.sd AS z
           FROM events e JOIN s ON e.event_type = s.event_type),
ranked AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                        ORDER BY abs(z) DESC, event_id) AS rk
           FROM scored)
SELECT event_type, rk, event_id,
       CAST(round(value, 6) AS DOUBLE) AS value,
       CAST(round(z, 4) AS DOUBLE) AS zscore
FROM ranked WHERE rk <= 5 ORDER BY event_type, rk
""",
)

# Cumulative distinct users per day — first-seen day per user, daily
# new-user counts over the observed day spine, running sum. Integer
# arithmetic end to end.
register_sql(
    "cumulative_distinct_users",
    spark_sql="""
WITH e AS (SELECT user_id,
                  CAST((unix_micros(CAST(ts AS TIMESTAMP))) div 86400000000 AS BIGINT) AS day_no
           FROM events),
firsts AS (SELECT user_id, min(day_no) AS day_no FROM e GROUP BY user_id),
days AS (SELECT DISTINCT day_no FROM e),
newu AS (SELECT day_no, count(*) AS new_users FROM firsts GROUP BY day_no)
SELECT d.day_no, coalesce(n.new_users, 0) AS new_users,
       CAST(sum(coalesce(n.new_users, 0))
            OVER (ORDER BY d.day_no) AS BIGINT) AS cum_users
FROM days d LEFT JOIN newu n ON d.day_no = n.day_no
ORDER BY d.day_no
""",
    duck_sql="""
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_no FROM events),
firsts AS (SELECT user_id, min(day_no) AS day_no FROM e GROUP BY user_id),
days AS (SELECT DISTINCT day_no FROM e),
newu AS (SELECT day_no, count(*) AS new_users FROM firsts GROUP BY day_no)
SELECT d.day_no, coalesce(n.new_users, 0) AS new_users,
       CAST(sum(coalesce(n.new_users, 0))
            OVER (ORDER BY d.day_no) AS BIGINT) AS cum_users
FROM days d LEFT JOIN newu n ON d.day_no = n.day_no
ORDER BY d.day_no
""",
)

# Context-window chunking — split each document into fixed-size token
# windows (C=64) with overlap (stride S=48), emitting per-chunk token
# ranges. The training-data prep shape for fixed-context models; pure
# integer math (whitespace token counts, ceil-div chunk counts), so
# the spine explode is the only non-trivial operator.
register_sql(
    "doc_chunks",
    spark_sql="""
WITH d AS (SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= 64 THEN 1
                  ELSE 1 + CAST((n_tokens - 64 + 47) / 48 AS BIGINT) END AS n_chunks
      FROM d)
SELECT doc_id, chunk_id,
       (chunk_id - 1) * 48 AS start_tok,
       least((chunk_id - 1) * 48 + 64, n_tokens) AS end_tok,
       least((chunk_id - 1) * 48 + 64, n_tokens) - (chunk_id - 1) * 48 AS chunk_len
FROM c LATERAL VIEW explode(sequence(1, n_chunks)) AS chunk_id
ORDER BY doc_id, chunk_id
""",
    duck_sql="""
WITH d AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= 64 THEN 1
                  ELSE 1 + (n_tokens - 64 + 47) // 48 END AS n_chunks
      FROM d),
x AS (SELECT doc_id, n_tokens, unnest(generate_series(1, n_chunks)) AS chunk_id FROM c)
SELECT doc_id, chunk_id,
       (chunk_id - 1) * 48 AS start_tok,
       least((chunk_id - 1) * 48 + 64, n_tokens) AS end_tok,
       least((chunk_id - 1) * 48 + 64, n_tokens) - (chunk_id - 1) * 48 AS chunk_len
FROM x ORDER BY doc_id, chunk_id
""",
)

# Weighted Bernoulli sample, expected k=50, weight = n_chars — keep a
# doc iff md5-uniform(doc_id) < k·w/ΣW, tested as the cross-
# multiplication u·ΣW < k·w·2⁶⁰ (u < 2⁶⁰ from 15 hex chars). Each
# side is the same two correctly-rounded IEEE multiplies on both
# engines — no log/pow, no division — so the inclusion decision is
# bit-identical across engines even where the products exceed 2⁵³.
register_sql(
    "weighted_sample",
    spark_sql="""
WITH h AS (SELECT doc_id, lang, n_chars,
                  CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS u
           FROM documents),
w AS (SELECT sum(n_chars) AS total_w FROM h)
SELECT doc_id, lang, n_chars
FROM h CROSS JOIN w
WHERE CAST(u AS DOUBLE) * total_w < CAST(50 AS DOUBLE) * n_chars * CAST(1152921504606846976 AS DOUBLE)
ORDER BY doc_id
""",
    duck_sql="""
WITH h AS (SELECT doc_id, lang, n_chars,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS u
           FROM documents),
w AS (SELECT sum(n_chars) AS total_w FROM h)
SELECT doc_id, lang, n_chars
FROM h CROSS JOIN w
WHERE CAST(u AS DOUBLE) * total_w < CAST(50 AS DOUBLE) * n_chars * CAST(1152921504606846976 AS DOUBLE)
ORDER BY doc_id
""",
)

# TPC-H Q5 flavor — local-supplier revenue: six-way join (customer ⋈
# orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) where customer and
# supplier share a nation, revenue per nation for one region-year.
# At scale: region/nation/supplier/customer broadcast down the chain;
# the only big shuffle is lineitem ⋈ orders on orderkey. Dialect-shared.
register_sql(
    "tpch_q5",
    spark_sql=f"""
SELECT n_name,
       CAST(round(sum({_REV_BASIS}) / 10000.0, 6) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation    ON s_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    duck_sql=f"""
SELECT n_name,
       CAST(round(sum({_REV_BASIS}) / 10000.0, 6) AS DOUBLE) AS revenue
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation    ON s_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)

# Weekly retention cohorts — users grouped by first-seen week; for
# each (cohort_week, week_offset) count distinct returning users and
# the retention ratio against the cohort size. Two shuffles at scale:
# the per-user min (partial-agg friendly) and the cohort×offset
# distinct-count; cohort matrix output is tiny (weeks²).
register_sql(
    "retention_cohorts",
    spark_sql="""
WITH e AS (SELECT user_id,
                  CAST((unix_micros(CAST(ts AS TIMESTAMP))) div 604800000000 AS BIGINT) AS week_no
           FROM events),
fw AS (SELECT user_id, min(week_no) AS cohort_week FROM e GROUP BY user_id),
cs AS (SELECT cohort_week, count(*) AS cohort_size FROM fw GROUP BY cohort_week),
act AS (SELECT f.cohort_week, e.week_no - f.cohort_week AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM e JOIN fw f USING (user_id)
        GROUP BY f.cohort_week, e.week_no - f.cohort_week)
SELECT a.cohort_week, a.week_offset, a.active_users, c.cohort_size,
       CAST(round(a.active_users / CAST(c.cohort_size AS DOUBLE), 6) AS DOUBLE) AS retention
FROM act a JOIN cs c USING (cohort_week)
ORDER BY cohort_week, week_offset
""",
    duck_sql="""
WITH e AS (SELECT user_id,
                  epoch_us(ts) // 604800000000 AS week_no
           FROM events),
fw AS (SELECT user_id, min(week_no) AS cohort_week FROM e GROUP BY user_id),
cs AS (SELECT cohort_week, count(*) AS cohort_size FROM fw GROUP BY cohort_week),
act AS (SELECT f.cohort_week, e.week_no - f.cohort_week AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM e JOIN fw f USING (user_id)
        GROUP BY f.cohort_week, e.week_no - f.cohort_week)
SELECT a.cohort_week, a.week_offset, a.active_users, c.cohort_size,
       CAST(round(a.active_users / CAST(c.cohort_size AS DOUBLE), 6) AS DOUBLE) AS retention
FROM act a JOIN cs c USING (cohort_week)
ORDER BY cohort_week, week_offset
""",
)

# RFM segmentation — recency / frequency / monetary quartiles per
# customer with a c_custkey tie-break so quartile assignment is
# deterministic across engines; segment code R*100+F*10+M. The Spark
# side computes each EXACT global ntile(4) via the two-phase bucketed
# rank (operators/mixing.py): the per-customer rollup grows with the
# data, and `ntile() OVER (ORDER BY …)` would funnel it through one
# task. ntile_expr derives exact ANSI NTILE from (pos, total).
#
# Determinism: money arithmetic is integer-cents end-to-end.
# o_totalprice is a 2-dp value, so round(x*100) -> BIGINT is exact per
# row; every sum is an exact integer sum (order-independent), and
# avg_monetary is ONE double division of two exact integers followed by
# ONE round — no float aggregate feeds a rounded output, so the 6-dp
# hash cannot flip with partition order (the r4 red-row class).


def _q_rfm_segments(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_ms_spark.operators.mixing import bucketed_global_rank, ntile_expr
    from flink_ms_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    r = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.expr(
            "datediff(TIMESTAMP_NTZ '2001-08-02 00:00:00', max(o_orderdate))"
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "monetary_cents"
        ),
    )

    def score(df, bucket, order_cols, name):
        ranked = bucketed_global_rank(df, bucket=bucket, order_cols=order_cols)
        return ranked.select("custkey", ntile_expr(4).alias(name))

    rs = score(
        r,
        F.col("recency_days").cast("long"),
        [F.col("recency_days").asc(), F.col("custkey").asc()],
        "r_score",
    )
    fs = score(
        r,
        (-F.col("frequency")).cast("long"),
        [F.col("frequency").desc(), F.col("custkey").asc()],
        "f_score",
    )
    ms = score(
        r,
        -(F.col("monetary_cents") / 100).cast("long"),
        [F.col("monetary_cents").desc(), F.col("custkey").asc()],
        "m_score",
    )
    s = r.join(rs, "custkey").join(fs, "custkey").join(ms, "custkey")
    seg = (
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
    ).alias("segment")
    return (
        s.groupBy(seg)
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum("monetary_cents") / (F.count("*") * 100.0), 6
            )
            .cast("double")
            .alias("avg_monetary"),
        )
        .orderBy("segment")
    )


from flink_ms_spark.plans.registry import register  # noqa: E402

register("rfm_segments", oracle="""
WITH r AS (SELECT o_custkey AS custkey,
                  datediff('day', max(o_orderdate), TIMESTAMP '2001-08-02 00:00:00') AS recency_days,
                  count(*) AS frequency,
                  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS monetary_cents
           FROM orders GROUP BY o_custkey),
s AS (SELECT custkey, recency_days, frequency, monetary_cents,
             ntile(4) OVER (ORDER BY recency_days, custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
      FROM r)
SELECT r_score * 100 + f_score * 10 + m_score AS segment,
       count(*) AS n_customers,
       CAST(round(sum(monetary_cents) / (count(*) * 100.0), 6) AS DOUBLE) AS avg_monetary
FROM s GROUP BY r_score * 100 + f_score * 10 + m_score
ORDER BY segment
""",
)(_q_rfm_segments)

# Markov transition matrix — P(next event_type | event_type) from each
# user's time-ordered event stream (lead over user partition, tie-break
# event_id). One window shuffle on user_id, then a tiny (5×5) aggregate.
register_sql(
    "markov_transitions",
    spark_sql="""
WITH ev AS (SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
e AS (SELECT src, dst, count(*) AS w FROM ev WHERE dst IS NOT NULL GROUP BY src, dst),
t AS (SELECT src, sum(w) AS tot FROM e GROUP BY src)
SELECT e.src, e.dst, e.w AS transitions,
       CAST(round(e.w / CAST(t.tot AS DOUBLE), 6) AS DOUBLE) AS prob
FROM e JOIN t USING (src)
ORDER BY src, dst
""",
    duck_sql="""
WITH ev AS (SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
e AS (SELECT src, dst, count(*) AS w FROM ev WHERE dst IS NOT NULL GROUP BY src, dst),
t AS (SELECT src, sum(w) AS tot FROM e GROUP BY src)
SELECT e.src, e.dst, e.w AS transitions,
       CAST(round(e.w / CAST(t.tot AS DOUBLE), 6) AS DOUBLE) AS prob
FROM e JOIN t USING (src)
ORDER BY src, dst
""",
)

# PageRank over the event-type transition graph — 3 unrolled power
# iterations, damping 0.85, uniform init over the node set. On the
# 5-node fixture graph the state is tiny; at corpus scale the same
# unrolled shape is N joins of rank⋈edges on src (rank table partitioned
# by node — each iteration is one shuffle of the rank vector, edges
# reused from cache). Final ranks rounded to 6 dp to absorb
# cross-engine summation order.
register_sql(
    "event_pagerank",
    spark_sql="""
WITH ev AS (SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM ev WHERE dst IS NOT NULL GROUP BY src, dst),
t AS (SELECT src, sum(w) AS tot FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, e.w / t.tot AS p FROM e JOIN t USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
p0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS pr FROM nodes CROSS JOIN nn),
p1 AS (SELECT n.node,
              (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
              + CAST(0.85 AS DOUBLE) * coalesce(sum(p0.pr * ew.p), CAST(0 AS DOUBLE)) AS pr
       FROM nodes n CROSS JOIN nn
       LEFT JOIN ew ON ew.dst = n.node LEFT JOIN p0 ON p0.node = ew.src
       GROUP BY n.node, nn.n),
p2 AS (SELECT n.node,
              (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
              + CAST(0.85 AS DOUBLE) * coalesce(sum(p1.pr * ew.p), CAST(0 AS DOUBLE)) AS pr
       FROM nodes n CROSS JOIN nn
       LEFT JOIN ew ON ew.dst = n.node LEFT JOIN p1 ON p1.node = ew.src
       GROUP BY n.node, nn.n),
p3 AS (SELECT n.node,
              (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
              + CAST(0.85 AS DOUBLE) * coalesce(sum(p2.pr * ew.p), CAST(0 AS DOUBLE)) AS pr
       FROM nodes n CROSS JOIN nn
       LEFT JOIN ew ON ew.dst = n.node LEFT JOIN p2 ON p2.node = ew.src
       GROUP BY n.node, nn.n)
SELECT node, CAST(round(pr, 6) AS DOUBLE) AS pagerank
FROM p3 ORDER BY pagerank DESC, node
""",
)

# EWMA smoothing of the per-type daily value series, alpha = 0.5.
# The recursion s_t = a·x_t + (1-a)·s_{t-1} is linearized as
# s_t = 0.5^t · Σ_{i≤t} c_i with c_0 = x_0·2^0, c_i = a·x_i·2^i —
# a cumulative-sum window, no recursion. alpha = 1/2 keeps every
# power-of-two factor exactly representable so both engines compute
# bit-identical terms; the ordered window sum fixes summation order.
#
# RENORMALIZED BLOCKS (designed in r3/07b28a0, implemented r5): the
# naive linearization carries x·2^t, which overflows double (→ Inf,
# then NaN) once a per-key series passes ~10³ points. The exponent is
# therefore restarted every B = 512 rows: with u = t mod B and
# blk = t div B,
#     s_t = 0.5^u · ( Σ_{same blk, s≤t} c_s·2^{u_s}  +  carry_blk )
#     carry_blk = S_{blk-1}·2^-B + S_{blk-2}·2^-2B
# where S_b is block b's full term sum. Every rescaling is an exact
# power of two; |term| ≤ |x|·2^511 never overflows, and blocks older
# than blk-2 contribute < 2^-1536 — below double's subnormal floor,
# i.e. exactly the 0 the IEEE fold would produce. Unbounded series
# length per key, same shuffle shape (one extra block-level rollup of
# |series|/B rows). Property-pinned by tests (10k-point key, finite,
# matches the sequential recursion).
_EWMA_SQL = """
WITH e AS (SELECT event_type, {day} AS day_no, value FROM events),
d AS (SELECT event_type, day_no, CAST(round(sum(value), 6) AS DOUBLE) AS x
      FROM e GROUP BY event_type, day_no),
r AS (SELECT event_type, day_no, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day_no) - 1 AS t
      FROM d),
c AS (SELECT event_type, day_no, x, t,
             CAST({blk} AS BIGINT) AS blk,
             CAST(t % 512 AS BIGINT) AS u,
             CASE WHEN t = 0 THEN x ELSE CAST(0.5 AS DOUBLE) * x END
               * power(CAST(2 AS DOUBLE), t % 512) AS term
      FROM r),
s AS (SELECT event_type, blk, sum(term) AS s_blk FROM c GROUP BY event_type, blk),
k AS (SELECT event_type, blk,
             coalesce(lag(s_blk, 1) OVER (PARTITION BY event_type ORDER BY blk),
                      CAST(0 AS DOUBLE)) * power(CAST(2 AS DOUBLE), -512)
           + coalesce(lag(s_blk, 2) OVER (PARTITION BY event_type ORDER BY blk),
                      CAST(0 AS DOUBLE)) * power(CAST(2 AS DOUBLE), -1024) AS carry
      FROM s)
SELECT event_type, day_no, x AS day_value,
       CAST(round(power(CAST(0.5 AS DOUBLE), u) *
                  (sum(term) OVER (PARTITION BY event_type, blk ORDER BY day_no
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   + carry), 6) AS DOUBLE) AS ewma
FROM c JOIN k USING (event_type, blk)
ORDER BY event_type, day_no
"""

EWMA_SPARK_SQL = _EWMA_SQL.format(
    day="CAST((unix_micros(CAST(ts AS TIMESTAMP))) div 86400000000 AS BIGINT)",
    blk="t div 512",
)
EWMA_DUCK_SQL = _EWMA_SQL.format(day="epoch_us(ts) // 86400000000", blk="t // 512")

register_sql("ewma_smooth", spark_sql=EWMA_SPARK_SQL, duck_sql=EWMA_DUCK_SQL)

# Per-segment spend CDF — cume_dist / percent_rank over a unique
# (spend, custkey) ordering so every row is its own peer group and
# both ranks are deterministic across engines. One shuffle for the
# per-customer rollup, one window sort per segment partition.
register_sql(
    "order_value_cdf",
    f"""
WITH s AS (SELECT c_mktsegment, c_custkey,
                  CAST(round(sum({money_cents('o_totalprice')}) / 100.0, 6) AS DOUBLE) AS spend
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, c_custkey)
SELECT c_mktsegment, c_custkey, spend,
       CAST(round(cume_dist() OVER
             (PARTITION BY c_mktsegment ORDER BY spend, c_custkey), 6)
            AS DOUBLE) AS cdf,
       CAST(round(percent_rank() OVER
             (PARTITION BY c_mktsegment ORDER BY spend, c_custkey), 6)
            AS DOUBLE) AS prank
FROM s ORDER BY c_mktsegment, c_custkey
""",
)

# PIVOT — order counts per priority pivoted to one column per status.
# Spark's native PIVOT clause; the DuckDB twin is the equivalent
# conditional aggregation (dialects differ on PIVOT syntax, semantics
# identical: absent (priority, status) cells are NULL counts).
register_sql(
    "pivot_order_status",
    spark_sql="""
SELECT o_orderpriority,
       coalesce(f, 0) AS f, coalesce(o, 0) AS o, coalesce(p, 0) AS p
FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
PIVOT (count(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
ORDER BY o_orderpriority
""",
    duck_sql="""
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS f,
       count(*) FILTER (o_orderstatus = 'O') AS o,
       count(*) FILTER (o_orderstatus = 'P') AS p
FROM orders GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# CEP-style sequence pattern matching — the batch equivalent of Flink
# CEP / SQL MATCH_RECOGNIZE (which Spark lacks): per user, the
# time-ordered event-initial journey string, then non-overlapping
# regex matches of the pattern view (click)* purchase = 'vc*p'.
# One groupBy(user) shuffle; the sort is per-user inside array_sort
# (journey length = user activity, bounded); regex scan is linear.
# Both engines scan leftmost non-overlapping with greedy star —
# identical counts. Event initials are distinct (c/e/p/s/v).
register_sql(
    "cep_sequence_match",
    spark_sql="""
WITH j AS (SELECT user_id, count(*) AS n_events,
                  array_join(transform(array_sort(collect_list(
                      struct(ts, event_id, substr(event_type, 1, 1) AS ch))),
                    x -> x.ch), '') AS journey
           FROM events GROUP BY user_id)
SELECT user_id, n_events,
       CAST(regexp_count(journey, 'vc*p') AS BIGINT) AS n_matches
FROM j WHERE regexp_count(journey, 'vc*p') >= 1
ORDER BY user_id
""",
    duck_sql="""
WITH j AS (SELECT user_id, count(*) AS n_events,
                  string_agg(substr(event_type, 1, 1), ''
                             ORDER BY ts, event_id) AS journey
           FROM events GROUP BY user_id)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(journey, 'vc*p')) AS BIGINT) AS n_matches
FROM j WHERE len(regexp_extract_all(journey, 'vc*p')) >= 1
ORDER BY user_id
""",
)


# Lakehouse CDC MERGE (Delta/Iceberg MERGE INTO shape): the last two
# observed days of the event log are a change feed applied to the
# snapshot built from everything before — latest-wins per user on both
# sides (max_by over the zero-padded ts||event_id key, the same
# sort-free arg-max as user_last_event), 'error' events are tombstones.
# The FULL OUTER join classifies every key as insert / update / delete
# / keep, with the post-merge value (NULL for deletes). At scale both
# sides partial-aggregate map-side before ONE key-partitioned join;
# there is no window sort over the raw log.
register_sql(
    "cdc_upsert_merge",
    spark_sql="""
WITH e AS (SELECT user_id, event_type, value,
                  CAST(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS BIGINT) AS day_no,
                  lpad(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING), 20, '0')
                    || lpad(CAST(event_id AS STRING), 12, '0') AS ok
           FROM events),
cut AS (SELECT max(day_no) - 1 AS d0 FROM e),
base AS (SELECT user_id, max_by(value, ok) AS value
         FROM e, cut WHERE day_no < d0 GROUP BY user_id),
delta AS (SELECT user_id,
                 CASE WHEN max_by(event_type, ok) = 'error' THEN 'D'
                      ELSE 'U' END AS op,
                 max_by(value, ok) AS value
          FROM e, cut WHERE day_no >= d0 GROUP BY user_id)
SELECT coalesce(b.user_id, d.user_id) AS user_id,
       CASE WHEN d.user_id IS NULL THEN 'keep'
            WHEN d.op = 'D' THEN 'delete'
            WHEN b.user_id IS NULL THEN 'insert'
            ELSE 'update' END AS action,
       CAST(round(CASE WHEN d.user_id IS NULL THEN b.value
                       WHEN d.op = 'D' THEN NULL
                       ELSE d.value END, 6) AS DOUBLE) AS new_value
FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
ORDER BY user_id
""",
    duck_sql="""
WITH e AS (SELECT user_id, event_type, value,
                  epoch_us(ts) // 86400000000 AS day_no,
                  lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                    || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
           FROM events),
cut AS (SELECT max(day_no) - 1 AS d0 FROM e),
base AS (SELECT user_id, max_by(value, ok) AS value
         FROM e, cut WHERE day_no < d0 GROUP BY user_id),
delta AS (SELECT user_id,
                 CASE WHEN max_by(event_type, ok) = 'error' THEN 'D'
                      ELSE 'U' END AS op,
                 max_by(value, ok) AS value
          FROM e, cut WHERE day_no >= d0 GROUP BY user_id)
SELECT coalesce(b.user_id, d.user_id) AS user_id,
       CASE WHEN d.user_id IS NULL THEN 'keep'
            WHEN d.op = 'D' THEN 'delete'
            WHEN b.user_id IS NULL THEN 'insert'
            ELSE 'update' END AS action,
       CAST(round(CASE WHEN d.user_id IS NULL THEN b.value
                       WHEN d.op = 'D' THEN NULL
                       ELSE d.value END, 6) AS DOUBLE) AS new_value
FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
ORDER BY user_id
""",
)

# Slowly-changing-dimension type-2 interval build — the warehouse twin
# of user_state_intervals (which reports run STATS): one row per
# consecutive same-state run per user with [valid_from, valid_to)
# bounds, valid_to = next run's start (NULL while current). Island id =
# the classic two-window rn - rn_t trick; timestamps surface as epoch
# micros (BIGINT) so cross-engine dtype canonicalization is exact.
# Scale shape: both windows and the final lead() are PARTITIONED BY
# user_id — per-key sorts, no global window; the agg partial-combines.
register_sql(
    "scd2_intervals",
    spark_sql="""
WITH o AS (SELECT user_id, event_type,
                  unix_micros(CAST(ts AS TIMESTAMP)) AS tsu,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn_t
           FROM events),
runs AS (SELECT user_id, event_type AS state,
                min(tsu) AS valid_from, count(*) AS n_events,
                min(rn) AS ord
         FROM o GROUP BY user_id, event_type, rn - rn_t)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY ord)
         AS valid_to,
       n_events
FROM runs ORDER BY user_id, valid_from
""",
    duck_sql="""
WITH o AS (SELECT user_id, event_type,
                  epoch_us(ts) AS tsu,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn_t
           FROM events),
runs AS (SELECT user_id, event_type AS state,
                min(tsu) AS valid_from, count(*) AS n_events,
                min(rn) AS ord
         FROM o GROUP BY user_id, event_type, rn - rn_t)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY ord)
         AS valid_to,
       n_events
FROM runs ORDER BY user_id, valid_from
""",
)

# TPC-H Q21 flavor (round 10) — suppliers who kept orders waiting: for
# finished ('F') orders, the supplier whose line shipped >90 days after
# the order date while EVERY other supplier on the same multi-supplier
# order shipped on time. The fixture has no l_commitdate/l_receiptdate
# (TESTDATA.md), so lateness is defined against o_orderdate; the SHAPE
# is the point — the same correlated EXISTS (semi) + NOT EXISTS (anti,
# with a non-equality outer reference) self-join pair as the standard
# Q21, the hardest decorrelation case in the TPC-H suite.
#
# Scale: Catalyst decorrelates both subqueries into left-semi /
# left-anti joins keyed on l_orderkey — the same key as the
# orders⋈lineitem join, so AQE reuses one exchange of lineitem across
# all three; supplier/nation broadcast. Dialect-shared SQL.
register_sql(
    "tpch_q21",
    spark_sql="""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)


# Z-order layout skipping report (round 10) — the data-layout design
# artifact behind multi-dimensional file pruning. Events are mapped to
# a Morton (bit-interleaved) key over (user offset, day offset); files
# are modeled as 64 equal key-range buckets, and the report compares a
# Z-ORDERED layout against a time-LINEAR one on the same box query
# (20 users x 20 days): per layout, how many buckets a min/max-pruned
# scan must touch and what fraction of rows it skips. On a real
# cluster this is exactly parquet footer min/max skipping after
# `df.sort(zvalue).write` — the query is the planning report that
# justifies the layout before rewriting 100 TB.
#
# Scale: the z-value is a pure narrow map (integer bit arithmetic, no
# UDF); per-bucket min/max/count is a partial-aggregating shuffle on a
# 64-key space; the min-offset attach is a one-row broadcast cross
# join (the sanctioned aggregate-attach pattern). Everything is exact
# integer math except the final rounded skip percentage, computed
# identically on both engines.


def _interleave_expr(x: str, y: str, bits: int, div: str) -> str:
    """Morton key: bit k of x -> bit 2k, bit k of y -> bit 2k+1,
    written as pure integer arithmetic ((v DIV 2^k) % 2 * 2^m) so the
    same builder serves Spark (`div`) and DuckDB (`//`)."""
    terms = []
    for k in range(bits):
        terms.append(f"(({x} {div} {1 << k}) % 2) * {1 << (2 * k)}")
        terms.append(f"(({y} {div} {1 << k}) % 2) * {1 << (2 * k + 1)}")
    return " + ".join(terms)


def _zorder_sql(div: str, day_expr: str) -> str:
    z = _interleave_expr("x", "y", 8, div)
    return f"""
WITH e AS (SELECT user_id, {day_expr} AS day_no FROM events),
m AS (SELECT min(user_id) AS mu, min(day_no) AS md FROM e),
n AS (SELECT least(user_id - mu, 255) AS x,
             least(day_no - md, 255) AS y
      FROM e CROSS JOIN m),
z AS (SELECT x, y, ({z}) AS zv FROM n),
zb AS (SELECT zv {div} 1024 AS bucket,
              min(x) AS min_x, max(x) AS max_x,
              min(y) AS min_y, max(y) AS max_y,
              count(*) AS n_rows
       FROM z GROUP BY zv {div} 1024),
lb AS (SELECT y {div} 4 AS bucket,
              min(x) AS min_x, max(x) AS max_x,
              min(y) AS min_y, max(y) AS max_y,
              count(*) AS n_rows
       FROM z GROUP BY y {div} 4),
boxed AS (
  SELECT 'linear' AS layout, bucket, n_rows,
         CASE WHEN max_x >= 10 AND min_x <= 29
               AND max_y >= 5 AND min_y <= 24 THEN 1 ELSE 0 END AS hit
  FROM lb
  UNION ALL
  SELECT 'zorder' AS layout, bucket, n_rows,
         CASE WHEN max_x >= 10 AND min_x <= 29
               AND max_y >= 5 AND min_y <= 24 THEN 1 ELSE 0 END AS hit
  FROM zb)
SELECT layout,
       count(*) AS n_buckets,
       CAST(sum(hit) AS BIGINT) AS buckets_scanned,
       CAST(sum(n_rows) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN hit = 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       round(CAST(sum(CASE WHEN hit = 0 THEN n_rows ELSE 0 END) AS DOUBLE)
             * 100 / sum(n_rows), 6) AS skip_pct
FROM boxed
GROUP BY layout
ORDER BY layout
"""


register_sql(
    "zorder_skipping",
    spark_sql=_zorder_sql(
        "div", "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
    ),
    duck_sql=_zorder_sql("//", "epoch_us(ts) // 86400000000"),
)
