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

`scripts/rotate_window.py` GENERATES the next window from the
CORRECTNESS_r*.json record (red rows first, --changed names second,
then oldest-latest-green-first, alphabetical within a round) — run it
at the start of each round and paste its output here.
"""

from __future__ import annotations

import flink_ms_spark.plans.analytics  # noqa: F401
import flink_ms_spark.plans.curation  # noqa: F401
import flink_ms_spark.plans.hygiene  # noqa: F401
import flink_ms_spark.plans.mixing  # noqa: F401
import flink_ms_spark.plans.northstar  # noqa: F401
import flink_ms_spark.plans.pipeline  # noqa: F401
import flink_ms_spark.plans.reference  # noqa: F401
import flink_ms_spark.plans.relational  # noqa: F401
from flink_ms_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: F401

# Round-10 window, REGENERATED mid-round by `scripts/rotate_window.py
# --changed media_frames` after this round's TEN new registrations
# (staleness after r9: {never: 11, r5: 18, r6: 49, r7: 46, r8: 49,
# r9: 50}; no red rows). Per the rotation contract: media_frames
# leads because its oracle changed AFTER the r9 gate ran
# (content-bearing decode, commit 7807c67); then the eleven
# never-checked names alphabetically — bloom_decontaminate,
# cdc_chunk_dedup, cdc_upsert_merge, gopher_rules, inverted_index,
# k_anonymity, scd2_intervals, skew_salted_join, tpch_q21 and
# zorder_skipping
# (new this round, registered BEFORE the gate so they never repeat
# the media_video_dedup gap) and media_video_dedup itself (registered
# in the final r9 commit, post-gate); then the 18 r5-stale names; then
# the first 20 of the 49 r6-stale names alphabetically. After this
# window's driver run the oldest green record rises from r5 to r6 and
# every catalog query has a driver row.
#
# ROUND-11 CONTRACT: front-load the 29 r6-stale names this window
# could not fit (ivf_kmeans_topk, ivf_topk, lang_id, lsh_pairs, mad_outliers, mean_vector,
# media_features, media_meta, minhash, model_codec, mse, nan_guard,
# new_vs_returning, ngram_jaccard, order_backlog, parse_ratings,
# peak_concurrency, pii_scrub, posexplode_1idx, range_concat,
# readability, rolling_7d_distinct_users, rolling_fingerprints,
# semantic_dedup, session_duration_stats, ship_delay_stats,
# transition_dwell, triangle_copurchase, zipf_slope), then continue
# oldest-first into the r7 cohort, plus any red row and any name
# whose plan/oracle changed — regenerate with rotate_window.py as
# always.
_PRIORITY = [
    # oracle changed after the r9 gate ran — re-check first
    "media_frames",
    # never-checked: alphabetical — the ten round-10 registrations
    # and the post-r9-gate one
    "bloom_decontaminate",
    "cdc_chunk_dedup",
    "cdc_upsert_merge",
    "gopher_rules",
    "inverted_index",
    "k_anonymity",
    "media_video_dedup",
    "scd2_intervals",
    "skew_salted_join",
    "tpch_q21",
    "zorder_skipping",
    # r5-stale (latest green driver row is round 5), all 18
    "promo_revenue",
    "recursive_month_spine",
    "region_revenue",
    "retention_cohorts",
    "returned_items",
    "rfm_segments",
    "rolling_7d_revenue",
    "rollup_orders",
    "shipping_priority",
    "status_pivot",
    "string_funcs",
    "top_customers",
    "top_supplier",
    "topk_orders",
    "tpch_q5",
    "unpivot_segment_stats",
    "volume_shipping",
    "window_lag",
    # r6-stale, first 20 alphabetically (of 49)
    "allpairs_jaccard",
    "als_dot",
    "als_topn_recs",
    "attribution_linear",
    "behavior_entropy",
    "brand_return_rate",
    "bucket",
    "coldstart",
    "column_profile",
    "corpus_curation",
    "cosine_topk",
    "dedup_exact",
    "doc_fingerprint",
    "dup_canonical",
    "dup_clusters",
    "embedding_neardup",
    "equidepth_histogram",
    "funnel_3step",
    "heavy_hitter_terms",
    "item_item_cosine",
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
