"""Unit tests for duplicate-cluster resolution (operators/cluster.py)."""

from __future__ import annotations

from flink_ms_spark.operators.cluster import (
    canonical_per_component,
    connected_components,
)


def test_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: a diameter-3 chain — exercises multi-round propagation
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_two_components_and_canonical(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7), (20, 30)], ["a", "b"])
    cc = connected_components(pairs)
    comps = {(r.node, r.component) for r in cc.collect()}
    assert comps == {(5, 5), (9, 5), (7, 5), (20, 20), (30, 20)}
    summary = {
        (r.component, r.n_docs, r.canonical_doc_id)
        for r in canonical_per_component(cc).collect()
    }
    assert summary == {(5, 3, 5), (20, 2, 20)}


def test_edge_order_irrelevant(spark):
    # same graph, reversed/duplicated edges → same fixpoint
    pairs = spark.createDataFrame([(4, 3), (3, 4), (2, 3), (1, 2)], ["a", "b"])
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_bipartite_matches_pair_graph(spark):
    from flink_ms_spark.operators.cluster import connected_components_bipartite

    # buckets: {1,2} share g1, {2,3} share g2, {5,6} share g3; 9 alone
    rows = [(1, "g1"), (2, "g1"), (2, "g2"), (3, "g2"), (5, "g3"), (6, "g3"), (9, "g4")]
    m = spark.createDataFrame(rows, ["node", "group"])
    want = {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}
    # 9 is in no >=2 bucket -> excluded, exactly like the pair graph;
    # local union-find path and distributed propagation path agree
    got_local = {
        (r.node, r.component) for r in connected_components_bipartite(m).collect()
    }
    got_dist = {
        (r.node, r.component)
        for r in connected_components_bipartite(m, local_threshold=0).collect()
    }
    assert got_local == want
    assert got_dist == want
