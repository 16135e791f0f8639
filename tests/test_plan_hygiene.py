"""Catalog-wide physical-plan hygiene: the anti-patterns that kill a
100 TB run must not creep into any registered query.

**Unpartitioned windows** (``row_number() OVER (ORDER BY …)`` etc.)
funnel their whole input through ONE task. They are acceptable only
over bounded summary frames (bucket/lang/shard/day tables, already
top-k-limited lists) — every such use is allowlisted here WITH its
bound, so a new corpus-scale one fails the suite.

(Cross joins are NOT swept here: the catalog's crossJoins are one-row
aggregate broadcasts — totals/stats rows — which plan as a 1-row
BroadcastNestedLoopJoin and are scale-free; the one genuinely risky
cross-product shape, recommendForAllUsers, has its own cartesian-free
plan pin in tests/test_predict_blocked.py.)
"""

from __future__ import annotations

import re

import pytest

from flink_ms_spark.plans.catalog import QUERIES

#: query -> why its unpartitioned window is bounded (the frame it runs
#: over cannot grow with corpus bytes). EXACTLY the queries that trip
#: the detector today — no dormant allowances (a dormant entry would
#: let a future corpus-scale window slip in under an old excuse).
GLOBAL_WINDOW_BOUNDED = {
    "dsir_sample": "bucket-offset prefix table (64 md5 buckets)",
    "unimax_alloc": "|langs|-row waterfill table",
    "interleave_sources": "bucket-offset prefix table (64-wide rank ranges)",
    "seeded_shuffle": "bucket-offset prefix table",
    "quality_curriculum": "bucket-offset prefix table",
    "rrf_fusion": "two top-20 lists (limit precedes the rank window)",
    "rolling_7d_revenue": "daily series (days, not bytes)",
    "cusum_changepoint": "daily series",
    "power_user_share": "bucket-offset prefix table (two-phase ntile)",
    "rfm_segments": "bucket-offset prefix tables (3x two-phase ntile)",
    "order_backlog": "daily order series",
    "mom_growth": "monthly series",
    "zipf_slope": "top-k vocab ranks",
    "cumulative_distinct_users": "daily first-seen series",
    "token_balanced_shards": "bucket-offset prefix table (weighted two-phase cum)",
    "vocab_coverage_curve": "rank window over the LIMIT-1000 top-vocab frame",
    "quality_blend": "bucket-offset prefix tables (3x two-phase percentile)",
    "data_constrained_mix": "|sources|x4 epoch-candidate table (rank + "
    "budget windows both run post-census on the model-scale frame)",
}

_UNPART_WINDOW = re.compile(r"windowspecdefinition\([a-zA-Z_]+#\d+L? (ASC|DESC)")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_global_window_or_cartesian(spark, sf_smoke, name):
    plan = (
        QUERIES[name](spark, sf_smoke)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    if _UNPART_WINDOW.search(plan):
        assert name in GLOBAL_WINDOW_BOUNDED, (
            f"{name} plans an unpartitioned window over a frame not "
            "documented as bounded — either repartition/two-phase it or "
            "allowlist it here with its bound"
        )


def _executed_plan(spark, sf_smoke, name: str) -> str:
    from flink_ms_spark.plans.catalog import QUERIES

    return QUERIES[name](spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name,min_broadcasts",
    [
        ("tpch_q5", 4),       # region/nation/customer/supplier dims
        ("region_revenue", 3),
        ("als_dot", 1),       # model side broadcasts against ratings
        ("top_customers", 1),
    ],
)
def test_dimension_joins_broadcast(spark, sf_smoke, name, min_broadcasts):
    """'Is this join broadcast-able, and did I broadcast it?' — pin the
    physical strategy on the classic dim-join queries: the small sides
    must plan as BroadcastHashJoin (a statistics or pushdown regression
    that flips them to shuffle joins fails here, long before a 100 TB
    run discovers it)."""
    plan = _executed_plan(spark, sf_smoke, name)
    assert plan.count("BroadcastHashJoin") >= min_broadcasts, plan[:2000]
    assert "CartesianProduct" not in plan


def test_scan_pushdown_and_column_pruning(spark, sf_smoke):
    """Filters and projections must reach the parquet scan: the
    pricing_summary shipdate predicate shows up in PushedFilters, and
    big_orders' scan reads exactly its two needed columns — a scan
    reading all 16 lineitem columns for a 2-column aggregate is wrong
    at any scale."""
    import re

    plan = _executed_plan(spark, sf_smoke, "pricing_summary")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "l_shipdate" in pushed, pushed

    plan = _executed_plan(spark, sf_smoke, "big_orders")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(len(s.split(",")) <= 2 for s in schemas), schemas


def test_tpch_q21_decorrelates_to_semi_and_anti(spark, sf_smoke):
    """The correlated EXISTS / NOT EXISTS pair must decorrelate into
    left-semi + left-anti joins (a regression to a per-row subquery
    plan would be quadratic at scale)."""
    plan = _executed_plan(spark, sf_smoke, "tpch_q21")
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_is_map_side(spark, sf_smoke):
    """bloom_decontaminate's prefilter must be a pure map over the
    train grams: the only exchanges in the plan belong to the distinct
    /aggregate stages, and the membership probe itself (ArrowEvalPython
    over the broadcast bitmap) must appear UNDER no exchange of the
    probe input — pinned the simple way: the probe side plans no
    SortMergeJoin (the confirm join stays broadcast) and no shuffle of
    the full gram explode reaches a join."""
    plan = _executed_plan(spark, sf_smoke, "bloom_decontaminate")
    assert "ArrowEvalPython" in plan, plan[:2000]  # vectorized probe
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_salted_join_exchanges_on_salt(spark, sf_smoke):
    """skew_salted_join must key its join exchange on (user_id, _salt)
    — if the salt ever falls out of the partitioning, the hot key
    collapses back into one task."""
    from flink_ms_spark.plans.catalog import QUERIES

    plan = (
        QUERIES["skew_salted_join"](spark, sf_smoke)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "_salt" in plan, plan[:2000]
