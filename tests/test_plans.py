"""Physical-plan shape assertions — the scale contract.

Correctness tests prove the operators work at sf0.01; these prove the
PLANS are the ones that survive 100×: filters and projections pushed
into the parquet scan, small sides broadcast, no Python in relational
hot paths (whole-stage codegen present).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ms_spark.operators.predict import predict_als_batch
from flink_ms_spark.plans.synthetic import synthetic_als_model
from flink_ms_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_oracle):
    df = (
        load_table(spark, sf_oracle, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in formatted and "l_quantity" in formatted.split(
        "PushedFilters"
    )[1].split("]")[0], "filter not pushed to parquet scan"


def test_column_pruning_reaches_scan(spark, sf_oracle):
    df = load_table(spark, sf_oracle, "lineitem").select("l_orderkey")
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    read_schema = formatted.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema, "scan reads unneeded columns"


def test_model_join_is_broadcast(spark, sf_oracle):
    queries = load_table(spark, sf_oracle, "events").select(
        F.col("user_id"), (F.col("event_id") % 200).alias("item_id")
    )
    scored = predict_als_batch(queries, synthetic_als_model(spark))
    plan = _plan(scored)
    assert "BroadcastHashJoin" in plan, "model join should broadcast the model side"
    assert "SortMergeJoin" not in plan, "query side must not shuffle for the model join"


def test_relational_hot_path_is_codegen(spark, sf_oracle):
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["pricing_summary"](spark, sf_oracle)
    df.collect()  # finalize the AQE plan so codegen spans are visible
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, "no whole-stage-codegen spans in final plan"
    # no Python evaluation in the relational path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_oracle):
    from flink_ms_spark.plans.catalog import QUERIES

    plan = _plan(QUERIES["pricing_summary"](spark, sf_oracle))
    # map-side combine: HashAggregate appears below and above the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_forecast_revenue_filters_pushed(spark, sf_oracle):
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["forecast_revenue"](spark, sf_oracle)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = formatted.split("PushedFilters")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_user_last_event_partial_aggregates(spark, sf_oracle):
    # max_by latest-per-key must partial-aggregate before the exchange
    # (the whole point of preferring it over a window sort)
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["user_last_event"](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, "expected map-side partial max_by"
    assert plan.index("partial_max_by") > plan.index("Exchange hashpartitioning"), (
        "partial agg must run below (after in plan text = before in dataflow) "
        "the hash exchange"
    )
    assert "Window" not in plan, "latest-per-key must not fall back to a window sort"


def test_repetition_stats_array_math_stays_jvm(spark, sf_oracle):
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["repetition_stats"](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_q5_broadcasts_dim_chain(spark, sf_oracle):
    # region/nation/supplier/customer are dims — the only sort-merge
    # shuffle allowed is lineitem ⋈ orders on orderkey
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["tpch_q5"](spark, sf_oracle)
    df.collect()  # finalize AQE so join strategies are the real ones
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, "dim chain must broadcast"
    assert plan.count("SortMergeJoin") <= 1, "only the fact-fact join may shuffle"


def test_allpairs_jaccard_never_goes_quadratic(spark, sf_oracle):
    # every join is keyed (shingle or doc id): a nested-loop / cartesian
    # anywhere means the prefix filter degenerated to |D|^2
    from flink_ms_spark.plans.catalog import QUERIES

    df = QUERIES["allpairs_jaccard"](spark, sf_oracle)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_timeseries_stay_jvm(spark, sf_oracle):
    # pure-SQL linearizations: no Python eval nodes anywhere
    from flink_ms_spark.plans.catalog import QUERIES

    for q in ("retention_cohorts", "markov_transitions", "ewma_smooth"):
        plan = _plan(QUERIES[q](spark, sf_oracle))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q


def test_attribution_and_item_cf_joins_are_keyed(spark, sf_oracle):
    # attribution_linear's time band must ride a user_id EQUI join as a
    # residual predicate (hash/sort-merge), never a nested loop; the
    # item-item pair self-join is keyed on user_id likewise
    from flink_ms_spark.plans.catalog import QUERIES

    for q in ("attribution_linear", "item_item_cosine"):
        plan = _plan(QUERIES[q](spark, sf_oracle))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_zorder_interleave_expr_matches_python():
    """The generated (v DIV 2^k)%2 arithmetic must equal true Morton
    interleaving for every 8-bit pair on a grid (exhaustive on a
    stride so the test stays fast)."""
    import duckdb

    from flink_ms_spark.plans.relational import _interleave_expr

    def morton(x: int, y: int) -> int:
        z = 0
        for k in range(8):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        return z

    expr = _interleave_expr("x", "y", 8, "//")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT x, y, {expr} AS z FROM (SELECT unnest(range(0, 256, 7)) x),"
        " (SELECT unnest(range(0, 256, 11)) y)"
    ).fetchall()
    assert rows
    for x, y, z in rows:
        assert z == morton(x, y), (x, y, z)
