"""The driver parses ONE JSON line from bench.py and records it as
BENCH_r{N}.json — a renamed catalog query or duplicate headline entry
would only surface as a mid-bench KeyError in the driver's run. Pin
the name-list integrity here instead."""

from __future__ import annotations


def test_bench_names_are_registered_and_unique():
    import bench
    from flink_ms_spark.plans.catalog import QUERIES

    missing = [n for n in bench.HEADLINE + bench.ITERATIVE if n not in QUERIES]
    assert not missing, f"bench names not in catalog: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"
    assert not set(bench.HEADLINE) & set(bench.ITERATIVE), (
        "a query must not be timed in both tiers"
    )


def test_bench_record_and_headline_agree_exactly():
    """Names once benched must stay benched (regressions need a
    round-over-round series), AND every headline name must have a
    recorded timing — a query added to HEADLINE without re-running
    bench.py leaves a record that silently understates coverage."""
    import json

    import bench

    full = json.load(open("bench_full.json"))
    gone = [n for n in full["queries"] if n not in bench.HEADLINE]
    assert not gone, f"benched names dropped from HEADLINE: {gone}"
    unbenched = [n for n in bench.HEADLINE if n not in full["queries"]]
    assert not unbenched, (
        f"HEADLINE names with no recorded timing (re-run bench.py): {unbenched}"
    )


def test_bench_record_has_serving_metrics():
    """The serving/training metrics are part of the BASELINE.md
    contract; a refactor of training_and_throughput_bench /
    point_lookup_bench that drops a key would silently shrink the
    record the judge diffs round-over-round."""
    import json

    full = json.load(open("bench_full.json"))
    for key in (
        "als_train_s",
        "als_train_first_s",  # cold-vs-warm split, recorded since r6
        "als_model_rows",
        "batch_predict_rows_per_s",
        "point_lookup_p50_ms",  # single-shot (reference parity) since r7
        "point_lookup_p95_ms",
        "point_lookup_p50_min2_ms",  # smoothed variant, own keys (r7)
        "point_lookup_p95_min2_ms",
        "point_lookup_spilled_p50_ms",  # DataFrame-backed store class (r7)
        "point_lookup_spilled_p95_ms",
        "iterative_queries",
    ):
        assert key in full, f"bench_full.json missing serving metric {key}"


def test_bench_record_is_fixed_depth_with_median_map():
    """ADVICE r6 (medium): committed records must hold sampling depth
    constant (six runs) and carry a median map alongside the min map so
    round-over-round comparisons don't conflate extra sampling with
    genuine improvement."""
    import json

    full = json.load(open("bench_full.json"))
    assert full["n_record_runs"] == 6, "record depth must stay fixed at 6"
    assert set(full["queries_median"]) == set(full["queries"])
    assert "value_median" in full
    # a per-query median can never beat the same runs' min
    bad = [
        n
        for n in full["queries"]
        if full["queries_median"][n] < full["queries"][n]
    ]
    assert not bad, f"median below min for: {bad}"
