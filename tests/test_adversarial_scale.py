"""Adversarial-input scale behavior: the corpus shapes that kill
naive dedup at web scale — boilerplate shared by EVERY document (hot
LSH buckets, hot line keys, concentrated SimHash signatures) — must
keep candidate volumes bounded / linear, not explode quadratically.
Integration pins of the SCALING.md claims on inputs far nastier than
the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

N_DOCS = 2000
TEMPLATE = "accept cookies subscribe newsletter all rights reserved"


def _boilerplate_docs(spark):
    """Every doc: identical template + a unique md5 tail — worst case
    for unigram LSH (template tokens collide corpus-wide)."""
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(TEMPLATE + " "), F.md5(F.col("id").cast("string"))
        ).alias("text"),
    )


def test_capped_lsh_stays_bounded_on_full_boilerplate(spark):
    """Uncapped unigram LSH on this corpus approaches N²/2 pairs (2M
    at N=2000). The cap must keep the expanded pair count orders of
    magnitude below that, and the stats row must surface the dropped
    hot-bucket volume instead of expanding it."""
    from flink_ms_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_pair_stats,
        minhash_signatures,
    )

    docs = _boilerplate_docs(spark)
    sigs = minhash_signatures(docs, num_hashes=4, shingle_n=1)
    cap = 32
    n_pairs = lsh_candidate_pairs(sigs, band_size=1, max_bucket_size=cap).count()
    assert n_pairs < N_DOCS * (N_DOCS - 1) // 20  # nowhere near quadratic

    row = lsh_pair_stats(sigs, band_size=1, max_bucket_size=cap).collect()[0]
    assert row.n_neardup_pairs == n_pairs
    # the template's hot buckets must be DROPPED (reported as doc
    # slots), and their volume dominates what was expanded
    assert row.n_dropped_bucket_docs > cap
    assert row.n_dropped_bucket_docs > row.n_neardup_pairs


def test_line_dedup_linear_on_hot_line_keys(spark):
    """5 boilerplate lines shared by ALL docs: per-line identity means
    the hot keys aggregate (count) rather than expand (pairs). Output
    must be exactly the unique tail per doc, structure intact."""
    from flink_ms_spark.operators.text import drop_duplicated_lines

    lines = [f"boiler {i}" for i in range(5)]
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("\n".join(lines) + "\n"),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
    )
    rows = drop_duplicated_lines(docs, min_docs=3).collect()
    assert len(rows) == N_DOCS
    for r in rows:
        assert r.n_lines == 6 and r.n_lines_kept == 1
        assert "boiler" not in r.text_clean and len(r.text_clean) == 32


def test_simhash_neardup_verified_on_template_corpus(spark):
    """Near-identical docs concentrate SimHash signatures (the
    template dominates the token mix). The verify stage must still
    gate every reported pair — hamming <= threshold, a < b — and the
    banded path must complete on the concentrated corpus."""
    from flink_ms_spark.operators.dedup import simhash_neardup

    docs = _boilerplate_docs(spark)
    pairs = simhash_neardup(docs, bits=16, n_bands=4, max_hamming=2)
    got = pairs.limit(200).collect()
    assert got, "template corpus must surface near-dup pairs"
    for r in got:
        assert r.a < r.b and 0 <= r.hamming <= 2


def test_video_lane_handles_frame_count_outlier(spark):
    """One 2000-frame stream among tiny 2-frame ones: the demux walks
    the long stream linearly, even-spacing picks exactly 4 original
    indices (0/500/1000/1500), and the fused features stay exact —
    constant frames make every expected value closed-form."""
    import numpy as np
    import pandas as pd

    from flink_ms_spark.operators.multimodal import (
        encode_ppm,
        video_frame_features,
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                n = 2000 if mid == 0 else 2
                stream = b"".join(
                    encode_ppm(4, 4, np.full((4, 4, 3), f % 256, dtype=np.uint8))
                    for f in range(n)
                )
                rows.append((int(mid), stream))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = spark.range(50).mapInPandas(gen, "media_id long, payload binary")
    out = {r.media_id: r for r in video_frame_features(media, 4).collect()}
    assert len(out) == 50
    big = out[0]
    # picks {0,500,1000,1500}: grays 0, 244, 232, 220 (constant frames)
    assert big.n_sampled == 4
    assert (big.first_gray, big.last_gray) == (0.0, 220.0)
    assert big.motion == round((244 + 12 + 12) / 3, 6)
    small = out[1]
    assert small.n_sampled == 2
    assert (small.first_gray, small.last_gray, small.motion) == (0.0, 1.0, 1.0)
