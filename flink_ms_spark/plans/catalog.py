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

# Round-3 window rotation: rounds 1-2 drove 68 distinct queries through
# the external gate (the §2 reference-parity and north-star sets — all
# green in CORRECTNESS_r01/r02). This round front-loads 50 queries that
# have NEVER had a driver row: the round-2 mixing/curation/BPE/ANN/graph
# families plus the relational tail. The previously-checked sets stay
# protected by the identical local gate (tests/test_oracle.py, all 180).
#
# ROUND-4 PLAN: 83 names will still lack a driver row after this round
# (the relational/TPC-H/analytics tail — distinct_segments, monthly
# revenue pack, set ops, LATERAL/RECURSIVE/PIVOT, CEP, pagerank, LOCF,
# the asof/range-join pack, log_histogram — plus this round's 23
# new queries: quality_logit_scores, bpe_fertility, curation_funnel,
# simhash_neardup, semantic_decontaminate, token_balanced_shards,
# lang_confusion, vocab_coverage_curve, recs_ranking_eval,
# quality_calibration, dedup_method_agreement, pii_census, line_dedup,
# quality_blend, neardup_rate_by_source, centroid_drift, ann_recall,
# recs_ndcg, benford_audit, lang_source_chi2, key_skew_report,
# media_audio_stats, hard_negatives). Rotate 50 of them next round; the final ~33 (plus any round-4 additions) close out in
# round 5 — full catalog driver coverage by round 5.
_PRIORITY = [
    # Mixing / sampling / curriculum (plans/mixing.py)
    "dsir_weights",
    "dsir_sample",
    "unimax_alloc",
    "temperature_mix",
    "interleave_sources",
    "seeded_shuffle",
    "quality_curriculum",
    "domain_mix",
    "split_assign",
    "stratified_sample",
    "weighted_sample",
    "fixed_k_sample",
    "cluster_balanced_sample",
    "training_mix_manifest",
    "shard_manifest",
    # Tokenizer / LM / text-statistics (operators/text.py families)
    "bpe_merges",
    "bpe_encode",
    "char_trigram_lm",
    "lm_score",
    "perplexity_buckets",
    "vocab_coverage",
    "repetition_stats",
    "duplicated_ngrams",
    "char_entropy",
    "compression_ratio",
    "doc_chunks",
    "sequence_packing",
    "decontaminate",
    # Dedup / similarity round-2 tier
    "dedup_report",
    "substring_dedup",
    "lev_neardup",
    "hyperplane_neardup",
    "pq_topk",
    "ivf_pq_topk",
    "sq8_stats",
    "pca_scores",
    "kmeans_doc_clusters",
    "knn_classify",
    "bm25_search",
    "rrf_fusion",
    # Graph / multimodal round-2 tier
    "lpa_communities",
    "community_modularity",
    "media_pixel_stats",
    # Relational / TPC-H tail never driver-checked
    "sessionize",
    "tpch_q5",
    "retention_cohorts",
    "pricing_summary",
    "region_revenue",
    "rolling_7d_revenue",
    "window_rank",
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
