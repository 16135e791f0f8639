"""The kernel-prune contract (_prune_candidates): every scan/report
kernel prunes per-query candidates on the ROUNDED score — the exact
key the final ranker orders on — keeping the whole boundary-tie class.

Pruning on the raw value (the pre-round-14 behavior) could evict a
lower-id candidate that rounds to the boundary value while keeping a
higher-id one; the final rank's deterministic id tie-break then
disagrees with the oracle. Fixture corpora rarely produce >margin
boundary ties inside one Arrow batch, so this is pinned directly at
the kernel, where the corpus-scale failure is cheap to construct.
"""

import numpy as np

from flink_ms_spark.operators.similarity import _prune_candidates


def test_boundary_ties_all_kept_descending():
    # 10 candidates whose RAW sims differ in the 7th decimal but all
    # round to 0.5 — more than margin=4; a raw-value prune would keep
    # an arbitrary 4 (by raw order: the HIGHEST raw values, i.e. the
    # LAST ids here), evicting the low ids the final rank must keep
    q_ids = np.array([7], dtype=np.int64)
    c_ids = np.arange(10, dtype=np.int64)
    sims = np.array([[0.5 + i * 1e-8 for i in range(10)]])
    out = _prune_candidates(q_ids, c_ids, sims, margin=4, value_col="sim")
    assert sorted(out["b"]) == list(range(10))
    assert (out["sim"] == 0.5).all()


def test_boundary_ties_all_kept_ascending():
    q_ids = np.array([1], dtype=np.int64)
    c_ids = np.arange(8, dtype=np.int64)
    # distances: 6 candidates round to 2.0 (ties), margin=3
    ad2 = np.array([[2.0 + i * 1e-8 for i in range(6)] + [9.0, 9.5]])
    out = _prune_candidates(q_ids, c_ids, ad2, margin=3, value_col="ad2",
                            ascending=True)
    assert sorted(out["b"]) == list(range(6))  # 9.0/9.5 pruned
    assert (out["ad2"] == 2.0).all()


def test_distinct_values_prune_to_margin():
    q_ids = np.array([0], dtype=np.int64)
    c_ids = np.arange(10, dtype=np.int64)
    sims = np.array([[i / 10 for i in range(10)]])  # distinct at 6 dp
    out = _prune_candidates(q_ids, c_ids, sims, margin=4, value_col="sim")
    assert sorted(out["b"]) == [6, 7, 8, 9]


def test_masked_rows_drop_out():
    # one query fully masked (-inf), one with a single finite score
    q_ids = np.array([0, 1], dtype=np.int64)
    c_ids = np.arange(3, dtype=np.int64)
    sims = np.array([[-np.inf] * 3, [-np.inf, 0.25, -np.inf]])
    out = _prune_candidates(q_ids, c_ids, sims, margin=4, value_col="sim")
    assert out["a"].tolist() == [1] and out["b"].tolist() == [1]


def test_empty_batch_keeps_dtypes():
    out = _prune_candidates(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        np.zeros((0, 0)), margin=4, value_col="sim",
    )
    assert len(out) == 0
    assert out["a"].dtype == np.int64 and out["sim"].dtype == np.float64
