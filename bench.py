#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries from the catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing
full execution through the noop sink (no driver-side row transfer), and
prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Also measures ModelStore point-lookup latency (the reference's
headline metric — ALSPredictRandom.java emits per-query ms) as extra
keys, without breaking the one-line contract.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

from flink_ms_spark.plans.catalog import QUERIES
from flink_ms_spark.serving.store import ModelStore
from flink_ms_spark.session import get_spark
from flink_ms_spark.plans.synthetic import synthetic_als_model
from flink_ms_spark.functions.codecs import model_key

HEADLINE = [
    # relational core
    "pricing_summary",
    "region_revenue",
    "top_customers",
    "order_priority",
    "window_rank",
    "monthly_revenue",
    "rollup_orders",
    # reference model-serving parity
    "als_dot",
    "svm_predict",
    "mse",
    "sgd_step",
    "coldstart",
    # north-star pipeline
    "dedup_exact",
    "text_quality",
    "minhash",
    "simhash",
    "cosine_topk",
    "ivf_topk",
    "ivf_kmeans_topk",
    "embedding_neardup",
    "token_stats",
    "pii_scrub",
    "media_meta",
    "serving_upsert",
    "sessionize",
    "series_correlation",
    "corpus_curation",
    # round-1 widening: cluster dedup, as-of, TF-IDF, packing,
    # quantiles, TPC-H Q7 flavor
    "dup_clusters",
    "asof_purchase_view",
    "tfidf_top_terms",
    "sequence_packing",
    "value_quantiles",
    "volume_shipping",
    # curation + TPC-H widening
    "repetition_stats",
    "decontaminate",
    "domain_mix",
    "returned_items",
    "customer_orders_dist",
    "lm_score",
    "lev_neardup",
    "hyperplane_neardup",
    "winsorized_stats",
    "pq_topk",
    "value_deciles",
    "preceding_5min_count",
    "duplicated_ngrams",
    "char_entropy",
    "training_mix_manifest",
    # time-series + search widening
    "daily_value_locf",
    "funnel_conversion",
    "bm25_search",
    "retention_cohorts",
    "event_pagerank",
    "allpairs_jaccard",
    "semantic_dedup",
    # sketch + analytics widening
    "heavy_hitter_terms",
    "hll_daily_users",
    "cusum_changepoint",
    "column_profile",
    "hopping_window_counts",
    "peak_concurrency",
    "mad_outliers",
    "equidepth_histogram",
    "item_item_cosine",
    "attribution_linear",
    "rolling_7d_distinct_users",
    "behavior_entropy",
    "ship_delay_stats",
    "readability",
    "session_duration_stats",
    "new_vs_returning",
    "funnel_3step",
    "transition_dwell",
    "power_user_share",
    "dow_seasonality",
    "order_backlog",
    "mom_growth",
    "brand_return_rate",
    "zipf_slope",
    # round-2 widening: substring-dedup removal, char-trigram LM,
    # hybrid retrieval fusion, shard balance
    "substring_dedup",
    "char_trigram_lm",
    "rrf_fusion",
    "shard_manifest",
    "bpe_merges",
    "perplexity_buckets",
    # round-2 mixing/clustering family
    "dsir_weights",
    "unimax_alloc",
    "seeded_shuffle",
    "quality_curriculum",
    "kmeans_doc_clusters",
    "knn_classify",
    "ivf_pq_topk",
    "bpe_encode",
    "dsir_sample",
    "cluster_balanced_sample",
    "media_pixel_stats",
    "log_histogram",
    "sq8_stats",
    "pca_scores",
    "vocab_coverage",
    "dedup_report",
    # round-3 widening: model-based quality scoring, tokenizer fertility
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
    # round-3 widening, continued: line-granularity dedup, blended
    # quality percentiles, per-source dup census, embedding drift
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
    # round-7 widening: pipeline-health audit family (plans/hygiene.py)
    "embedding_health",
    "dead_dims",
    "cross_source_dup_matrix",
    "minhash_calibration",
    "token_gini_by_source",
    # round-8 widening: real media feature lanes + pipeline allocators
    "media_histogram_features",
    "media_spectral_features",
    "media_dup_pairs",
    "data_constrained_mix",
    "snapshot_incremental_dedup",
    # round-9 widening: real video demux + temporal features
    "media_frame_features",
    # round-10 additions (VERDICT r9 items 3/7): the per-frame decode
    # lane and the content-fingerprint video dedup join the record now
    # that both carry driver CORRECTNESS rows in the r10 window, plus
    # the round's two new queries
    "media_frames",
    "media_video_dedup",
    "gopher_rules",
    "cdc_upsert_merge",
    # round-10 second wave: SCD2 interval build, the CDC-chunk storage
    # dedup report, the bounded postings-head index build, and the
    # correlated semi+anti TPC-H shape
    "scd2_intervals",
    "cdc_chunk_dedup",
    "inverted_index",
    "tpch_q21",
    # round-10 third wave: layout planning, bloom decon, salted join
    "zorder_skipping",
    "bloom_decontaminate",
    "skew_salted_join",
    # round-11: the one r10 query the record missed (VERDICT r10 #4)
    "k_anonymity",
    # round-12: ANN lifecycle monitor queries (per-cell IVF health,
    # per-subspace PQ drift) — priced as one vectorized narrow map +
    # O(cells|subspaces) shuffle rows each
    "ann_index_health",
    "pq_subspace_error",
    # round-13: the IVF persisted-members point lookup — cell-pruned
    # base read + live increment tail, per-query masked cosine kernel
    "ivf_members_lookup",
    # round-13 second wave: the persisted IVF-PQ point lookup —
    # cell-pruned code partitions, per-query masked ADC kernel
    "ivfpq_lookup",
    # round-14: the FAISS refine stage — ADC shortlist + exact re-rank
    # from the probed cells' member partitions (prices the extra
    # members join + exact kernel on top of ivfpq_lookup)
    "ivfpq_rerank",
]

# Iterative-graph tier: excluded from the headline mean (multi-round
# shuffle jobs, ~6-7 s each over the 2.4M-row symmetric sf0.1 adjacency)
# but measured every run under their own key so rounds can regress them.
ITERATIVE = [
    "lpa_communities",
    "triangle_copurchase",
]

# Arrow-mapInPandas decode queries — the only headline rows whose wall
# is dominated by the Python worker fleet rather than JVM codegen.
# (cdc_chunk_dedup / bloom_decontaminate also ride Arrow but stay in
# the reps=2 tier: the r10 record was built at that depth, and the
# pre-warm noop covers their worker-spawn exposure; revisit in r11 if
# either shows a respawn spike in the driver record.)
MEDIA_QUERIES = {
    "media_meta",
    "media_pixel_stats",
    "media_audio_stats",
    "media_features",
    "media_frames",
    "media_histogram_features",
    "media_spectral_features",
    "media_dup_pairs",
    "media_frame_features",
    "media_video_dedup",
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def point_lookup_bench(spark, n_queries: int = 1000) -> dict[str, float]:
    """Reference harness shape (ALSPredictRandom.java:55-97): N random
    (user,item) point lookups against the serving store, per-query ms.
    Set $SPARK_GRAFT_LATENCY_CSV to also write the reference's K5
    per-query CSV (``user,item,prediction,elapsed_ms``,
    ALSPredictRandom.java:94-97)."""
    store = ModelStore(spark, "ALS_MODEL")
    model = synthetic_als_model(spark)
    kv = model.select(model_key("id", "kind").alias("key"), "id", "kind", "factors")
    store.upsert_batch(kv)
    rng = random.Random(42)

    def _timed_query(u: int, i: int):
        t0 = time.perf_counter()
        uf = store.lookup(f"{u}-U")
        itf = store.lookup(f"{i}-I")
        hit = uf is not None and itf is not None
        # the dot product is part of the timed query, as in the
        # reference (predict happens inside the measured call)
        pred = (
            sum(a * b for a, b in zip(uf.factors, itf.factors))
            if hit
            else None
        )
        return hit, pred, (time.perf_counter() - t0) * 1000.0

    lat, lat_min2, rows = [], [], []
    for _ in range(n_queries):
        # Reference semantics (ALSPredictRandom.java:55-97): on a state
        # miss, RE-DRAW a fresh random key and query again until the
        # lookup hits; only the hit's latency lands in the K5 CSV.
        for _attempt in range(1000):
            u, i = rng.randrange(0, 120), rng.randrange(0, 200)
            hit, pred, ms = _timed_query(u, i)
            if hit:
                break
        else:
            raise RuntimeError("point_lookup_bench: no hit in 1000 draws")
        # PRIMARY metric = the single-shot timing, matching the
        # reference harness (ALSPredictRandom.java:62-94 times each
        # query exactly once) — a p95 built from min-of-repeats
        # structurally excludes the tail events p95 exists to measure
        # (ADVICE r6 high). The K5 CSV rows carry the single-shot ms.
        lat.append(ms)
        rows.append(f"{u},{i},{pred},{ms:.4f}")
        # SECONDARY smoothed metric under its own key: re-time the same
        # key and keep the min. A ~µs dict hit is small enough that one
        # GC/co-tenant pause landing inside it defines the p95 of the
        # whole run (r5 driver run: p95 110 µs against a 3–6 µs band
        # while p50 stayed in band); min-of-2 estimates the code's
        # cost. Published as *_min2_ms so it never masquerades as the
        # reference-parity tail.
        _, _, ms2 = _timed_query(u, i)
        lat_min2.append(min(ms, ms2))
    csv_path = os.environ.get("SPARK_GRAFT_LATENCY_CSV")
    if csv_path:
        with open(csv_path, "w") as f:
            f.write("\n".join(rows) + "\n")
    lat.sort()
    lat_min2.sort()
    return {
        "point_lookup_p50_ms": round(lat[len(lat) // 2], 4),
        "point_lookup_p95_ms": round(lat[int(len(lat) * 0.95)], 4),
        "point_lookup_p50_min2_ms": round(lat_min2[len(lat_min2) // 2], 4),
        "point_lookup_p95_min2_ms": round(lat_min2[int(len(lat_min2) * 0.95)], 4),
        **spilled_lookup_bench(spark, kv),
    }


def spilled_lookup_bench(spark, kv, n_queries: int = 50) -> dict[str, float]:
    """The spilled-store serving latency class (VERDICT r6 stretch):
    past ``max_dict_keys`` the store serves point lookups from a
    bucket-partitioned parquet generation — the driver computes
    crc32(key) % B and reads ONE partition file via cached pyarrow
    (round-8 redesign; previously a full-view Spark filter at ~51 ms
    p50, now ~2 ms). Measured single-shot, 50 hits on known keys, so
    the spill price stays a recorded fact rather than a docstring
    claim."""
    # hot_cache_keys=0 so every timed lookup pays the real leaf read —
    # the LRU warm tier is measured separately below
    store = ModelStore(spark, "ALS_MODEL_SPILLED", max_dict_keys=1, hot_cache_keys=0)
    store.upsert_batch(kv)
    assert store._spilled, "spilled-lookup bench requires an engaged spill"
    keys = [r.key for r in kv.select("key").limit(n_queries).collect()]
    store.lookup(keys[0])  # warm the point-filter codegen (not counted)
    lat = []
    for k in keys:
        t0 = time.perf_counter()
        row = store.lookup(k)
        lat.append((time.perf_counter() - t0) * 1000.0)
        assert row is not None
    lat.sort()
    # the r10 hot tier: repeat hits on cached keys are dict-speed (the
    # reference's RocksDB block-cache analogue); measured min-of-2 per
    # key like the in-memory tier, same pause-outlier rationale
    store.hot_cache_keys = n_queries
    for k in keys:
        store.lookup(k)  # populate the tier (not counted)
    hot = []
    for k in keys:
        t0 = time.perf_counter()
        store.lookup(k)
        ms = (time.perf_counter() - t0) * 1000.0
        t0 = time.perf_counter()
        store.lookup(k)
        hot.append(min(ms, (time.perf_counter() - t0) * 1000.0))
    hot.sort()
    return {
        "point_lookup_spilled_p50_ms": round(lat[len(lat) // 2], 4),
        "point_lookup_spilled_p95_ms": round(lat[int(len(lat) * 0.95)], 4),
        "point_lookup_hot_tier_p50_ms": round(hot[len(hot) // 2], 4),
        "point_lookup_hot_tier_p95_ms": round(hot[int(len(hot) * 0.95)], 4),
    }


def training_and_throughput_bench(spark, sf_dir: str) -> dict[str, float]:
    """The BASELINE.md 'metrics our harness emits' rows beyond the
    headline queries: ALS train wall (reference defaults: rank 10,
    10 iters, seed 42), and batch ALS predict throughput (broadcast
    model join over every fixture rating — the serving-side bulk
    path, vs the reference's per-record state RPCs)."""
    from flink_ms_spark.ml.als import als_model_table, train_als
    from flink_ms_spark.operators.predict import predict_als_batch
    from flink_ms_spark.sources.ratings import ratings_from_events

    ratings = ratings_from_events(spark, sf_dir)

    # Min-of-2 timed runs, mirroring the headline-query methodology:
    # r4 recorded a 10.9× single-run predict-throughput "collapse"
    # (332k→30k rows/s) that two standalone re-runs could not
    # reproduce — a co-tenant-load artifact, not a plan regression
    # (VERDICT.md r4 §What's wrong 3). Min of repeats estimates the
    # code's cost, not the neighbors'.
    train_runs = []
    n_model = 0
    for _ in range(2):
        t0 = time.perf_counter()
        model = train_als(ratings, rank=10, max_iter=10, reg_param=0.9, seed=42)
        table = als_model_table(model)
        n_model = table.count()  # forces training + table materialization
        train_runs.append(time.perf_counter() - t0)

    queries = ratings.select("user_id", "item_id")
    _force(predict_als_batch(queries, table))  # warm
    predict_runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        _force(predict_als_batch(queries, table))
        predict_runs.append(time.perf_counter() - t0)
    n_q = queries.count()
    return {
        # DEFINITION (round-6 clarification, ADVICE r5): min-of-2
        # retrains in an already-warmed session, i.e. a WARM retrain —
        # JIT, parquet footers, and shuffle machinery are hot. The
        # pre-r5 single-run values were cold-session trains; the two
        # are different metrics, so the first (colder) run is recorded
        # alongside rather than discarded.
        "als_train_s": round(min(train_runs), 2),
        "als_train_first_s": round(train_runs[0], 2),
        "als_model_rows": n_model,
        "batch_predict_rows_per_s": round(n_q / min(predict_runs)),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("flink-ms-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, file listing, catalog imports (not counted)
    _force(QUERIES["distinct_segments"](spark, sf_dir))

    # Python-worker fleet pre-warm (not counted): the media queries run
    # Arrow mapInPandas, and spawning the 32-worker Python fleet under
    # co-tenant load has spiked a media query in three consecutive
    # driver runs (r4-r6; r6: media_pixel_stats 6.58 s vs 1.24 s
    # committed min). One untimed no-op over cpus partitions forces the
    # daemon + worker pool up before anything is timed; workers are
    # reused afterwards (spark.python.worker.reuse defaults true).
    def _noop_batches(it):
        for batch in it:
            yield batch

    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Per-query: one untimed warm-up run, then MIN of two timed runs.
    # First executions are dominated by whole-stage-codegen compilation
    # and JIT (5-10× on sub-second queries — measured, see BASELINE.md);
    # steady-state throughput is what a resident engine delivers and
    # what the reference's long-lived serving job model implies. Min,
    # not mean: the box is co-tenant and per-query spikes of 2-3× under
    # external load are common (measured — see BASELINE.md); min of
    # repeated runs estimates the code's cost, not the neighbors'.
    times: dict[str, float] = {}
    for name in HEADLINE:
        _force(QUERIES[name](spark, sf_dir))
        walls = []
        # Media (Arrow mapInPandas) queries get min-of-3: their one
        # observed failure mode is a Python-worker respawn landing in
        # BOTH timed runs (r6 driver run), and a third sample at ~1 s
        # each is cheap insurance against it.
        reps = 3 if name in MEDIA_QUERIES else 2
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        times[name] = round(min(walls), 3)

    # iterative-graph tier: one timed run each (no warm-up min — these
    # are multi-round jobs where compilation is a small fraction),
    # reported under their own key, never in the headline total
    iterative: dict[str, float] = {}
    for name in ITERATIVE:
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, sf_dir))
        iterative[name] = round(time.perf_counter() - t0, 3)

    extra = point_lookup_bench(spark)
    extra.update(training_and_throughput_bench(spark, sf_dir))
    extra["iterative_queries"] = iterative
    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Round-1 lesson: the driver records only a TAIL of stdout, and the
    # full 75-query map overflowed it ("parsed": null). Stdout gets a
    # COMPACT line (total + slowest-10 walls + serving/train metrics);
    # the complete per-query map goes to bench_run.json next to this
    # script for round-over-round diffing. bench_full.json (the
    # committed six-run record, min+median maps) is written ONLY by
    # scripts/build_bench_record.py — a plain bench run must never
    # clobber it (round-7 lesson: the driver's own post-snapshot bench
    # run dirtied the record and flipped test_bench_contract red).
    full = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "queries": times,
        "sf": sf_val,
        **extra,
    }
    # SPARK_GRAFT_BENCH_OUT redirects the full map (used by
    # scripts/build_bench_record.py to collect N runs without
    # clobbering the committed record).
    full_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_run.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    top10 = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "queries": {k: times[k] for k in top10},
        "sf": sf_val,
        **extra,
    }
    print(json.dumps(compact))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
