"""Aggregate query catalog — importing a module registers its queries.

Exposes QUERIES / ORACLE_SQL for __spark_entry__.py.

Registration ORDER is part of the driver contract: the external
correctness gate checks the first 50 registered queries each round, so
the catalog front-loads (1) the SURVEY.md §2 reference-parity set,
(2) the north-star dedup/ANN/text/multimodal set, and (3) the
analytics queries whose oracles were repaired this round. Everything
else keeps its module order after the priority block (the local gate
in tests/test_oracle.py covers all of them every run regardless).
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

# Round-4 window rotation: rounds 1-3 drove 118 distinct queries
# through the external gate (all green). This round front-loads 50 of
# the 83 names that have NEVER had a driver row: round-3's 23 new
# queries (the newest code) plus the analytics/events tail (ASOF,
# LOCF, CEP, histogram/quantile, session/funnel/graph families). All
# previously-checked sets stay protected by the identical local gate
# (tests/test_oracle.py covers the full catalog every run).
#
# ROUND-5 PLAN: 33 names remain after this round (the relational/
# TPC-H tail — top_customers, set ops, LATERAL/RECURSIVE/PIVOT/
# GROUPING SETS, the monthly-revenue pack). Those plus round-4's new
# additions fill the round-5 window → full catalog driver coverage.
_PRIORITY = [
    # Round-3 additions (curation / quality / dedup-eval families)
    "quality_logit_scores",
    "bpe_fertility",
    "curation_funnel",
    "simhash_neardup",
    "semantic_decontaminate",
    "token_balanced_shards",
    "lang_confusion",
    "vocab_coverage_curve",
    "recs_ranking_eval",
    "quality_calibration",
    "dedup_method_agreement",
    "pii_census",
    "line_dedup",
    "quality_blend",
    "neardup_rate_by_source",
    "centroid_drift",
    "ann_recall",
    "recs_ndcg",
    "benford_audit",
    "lang_source_chi2",
    "key_skew_report",
    "media_audio_stats",
    "hard_negatives",
    # Analytics / events tail never driver-checked
    "asof_purchase_view",
    "preceding_5min_count",
    "log_histogram",
    "value_histogram",
    "value_quantiles",
    "value_stats",
    "value_deciles",
    "winsorized_stats",
    "order_value_cdf",
    "ewma_smooth",
    "daily_value_locf",
    "series_correlation",
    "forecast_revenue",
    "zscore_outliers",
    "markov_transitions",
    "event_pagerank",
    "cep_sequence_match",
    "session_window_agg",
    "user_state_intervals",
    "funnel_conversion",
    "event_cooccurrence",
    "cumulative_distinct_users",
    "rfm_segments",
    "user_last_event",
    "sources_per_lang",
    "events_json",
    "monthly_revenue",
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
