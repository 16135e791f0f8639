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
import flink_ms_spark.plans.mixing  # noqa: F401
import flink_ms_spark.plans.northstar  # noqa: F401
import flink_ms_spark.plans.pipeline  # noqa: F401
import flink_ms_spark.plans.reference  # noqa: F401
import flink_ms_spark.plans.relational  # noqa: F401
from flink_ms_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: F401

# Round-6 window: the record-age rotation contracted last round. After
# round 5, every one of the 201 catalog names has a green driver row;
# the staleness distribution of latest-green rounds is
# {r1: 13, r2: 49, r3: 45, r4: 44, r5: 50}. Windows now rotate
# OLDEST-RECORD-FIRST: all 13 r1-stale names plus the first 37 of the
# 49 r2-stale names (alphabetical within a round — a deterministic
# tiebreak so successive rounds never skip a name). Rationale: fixture
# re-rolls are the one proven source of latent reds (rfm_segments was
# green for three rounds before r4's flip), so the names that have gone
# longest without a driver re-check carry the most latent-red risk.
#
# ROUND-7 CONTRACT: front-load the 12 r2-stale names this window could
# not fit (serving_upsert, sgd_step, sgd_step_sequential, simhash,
# svm_predict, svm_predict_ranged, text_quality, tfidf_top_terms,
# token_stats, union_all, upper_trim, vocab_topk), then continue
# oldest-first (the r3 cohort), plus any name whose plan/oracle changed
# since its last record and any red row.
_PRIORITY = [
    # r1-stale (latest green driver row is round 1)
    "attribution_linear",
    "column_profile",
    "equidepth_histogram",
    "funnel_3step",
    "heavy_hitter_terms",
    "item_item_cosine",
    "readability",
    "rolling_7d_distinct_users",
    "session_duration_stats",
    "ship_delay_stats",
    "transition_dwell",
    "triangle_copurchase",
    "zipf_slope",
    # r2-stale, first 37 alphabetically (of 49)
    "allpairs_jaccard",
    "als_dot",
    "als_topn_recs",
    "behavior_entropy",
    "brand_return_rate",
    "bucket",
    "coldstart",
    "corpus_curation",
    "cosine_topk",
    "dedup_exact",
    "doc_fingerprint",
    "dup_canonical",
    "dup_clusters",
    "embedding_neardup",
    "ivf_kmeans_topk",
    "ivf_topk",
    "lang_id",
    "lsh_pairs",
    "mad_outliers",
    "mean_vector",
    "media_features",
    "media_frames",
    "media_meta",
    "minhash",
    "model_codec",
    "mse",
    "nan_guard",
    "new_vs_returning",
    "ngram_jaccard",
    "order_backlog",
    "parse_ratings",
    "peak_concurrency",
    "pii_scrub",
    "posexplode_1idx",
    "range_concat",
    "rolling_fingerprints",
    "semantic_dedup",
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
