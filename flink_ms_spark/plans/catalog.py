"""Aggregate query catalog — importing a module registers its queries.

Exposes QUERIES / ORACLE_SQL for __spark_entry__.py.

Registration ORDER is part of the driver contract: the external
correctness gate checks the FIRST 50 registered queries each round.
The catalog therefore maintains a ROTATING WINDOW — the `_PRIORITY`
block below names the 50 queries the current round puts in front of
the gate (see its comment for this round's selection rationale);
everything else keeps module-import order after the priority block.
The local gate in tests/test_oracle.py covers the full catalog every
run regardless, so rotation only changes which rows get an EXTERNAL
driver record, never what is tested.
"""

from __future__ import annotations

import flink_ms_spark.plans.analytics  # noqa: F401
import flink_ms_spark.plans.curation  # noqa: F401
import flink_ms_spark.plans.mixing  # noqa: F401
import flink_ms_spark.plans.northstar  # noqa: F401
import flink_ms_spark.plans.pipeline  # noqa: F401
import flink_ms_spark.plans.reference  # noqa: F401
import flink_ms_spark.plans.relational  # noqa: F401
from flink_ms_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: F401

# Round-5 window: closes external-gate coverage of the catalog.
# (1) The final 33 names that have NEVER had a driver row (the
#     relational/TPC-H tail — now the most money-dense set, checked
#     AFTER this round's integer-cents sweep of money aggregates).
# (2) The two ever-red rows: rfm_segments (r4 float-rounding flip,
#     fixed with integer-cents arithmetic this round) and
#     hll_daily_users (last record is r1 `no_oracle`; it has had an
#     oracle since r2 and verifies green locally).
# (3) Re-checks of every query whose plan/oracle changed this round
#     (the money sweep + the EWMA renormalized-block rewrite).
# (4) Remaining slots: re-checks of the float-aggregate sites the
#     sweep audit classified safe-by-analysis (on-grid sums / tiny
#     magnitudes), so the classification itself gets driver evidence.
#
# ROUND-6 CONTRACT: after this round's driver run, every catalog name
# has a driver record. Future windows rotate by RECORD AGE — front-load
# the 50 names whose latest green driver row is oldest, plus any name
# whose plan/oracle changed since its last record, plus any red row.
_PRIORITY = [
    # (2) ever-red rows
    "rfm_segments",
    "hll_daily_users",
    # (1) the 33 never-driver-checked relational/TPC-H names
    "top_customers",
    "order_priority",
    "window_lag",
    "rollup_orders",
    "cube_lineitem",
    "distinct_segments",
    "topk_orders",
    "customers_without_orders",
    "orders_building_segment",
    "case_agg",
    "string_funcs",
    "nations_with_both",
    "big_orders",
    "status_pivot",
    "exists_discounted",
    "part_small_qty",
    "nations_intersect",
    "nations_except",
    "big_order_customers",
    "grouping_sets_customer",
    "lateral_top_customers",
    "recursive_month_spine",
    "unpivot_segment_stats",
    "volume_shipping",
    "market_share",
    "promo_revenue",
    "bracket_revenue",
    "acctbal_no_orders",
    "shipping_priority",
    "returned_items",
    "customer_orders_dist",
    "top_supplier",
    "pivot_order_status",
    # (3) changed this round (money sweep / EWMA blocks) — re-check
    "pricing_summary",
    "region_revenue",
    "tpch_q5",
    "order_value_cdf",
    "ewma_smooth",
    "forecast_revenue",
    # (4) float sites classified safe-by-analysis — driver evidence
    "cusum_changepoint",
    "mom_growth",
    "power_user_share",
    "dow_seasonality",
    "hopping_window_counts",
    "retention_cohorts",
    "rolling_7d_revenue",
    "monthly_revenue",
    "daily_value_locf",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # fail fast: a renamed query silently shifts the window
        raise KeyError(f"catalog priority names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
