"""Duplicate-cluster resolution: connected components over a near-dup
candidate-pair graph (the standard corpus-dedup step after LSH —
group candidates into clusters, keep one canonical doc per cluster).

Scale notes (100 TB design point): min-label propagation converges in
O(graph diameter) rounds; near-dup graphs are shallow (dup clusters
are near-cliques), so 3-5 rounds in practice. Each round is one
shuffle on the node id — at cluster scale pre-`repartition` the edge
list by `u` so the per-round join and groupBy reuse one partitioning.
`localCheckpoint` truncates lineage so plans don't grow per round
(iterative DataFrame loops otherwise re-derive the whole chain).
For adversarial graphs (long chains) switch to the large-star /
small-star alternation, which converges in O(log n) rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns ``(node, component)`` for every node appearing in
    ``pairs``; ``component`` is the smallest node id in the node's
    connected component. Deterministic (pure min semilattice — the
    fixpoint is independent of iteration/partition order).
    """
    sym = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("comp", F.col("u"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("comp").alias("vcomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("ncomp"))
        )
        proposed = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                "comp"
            ),
            F.col("comp").alias("old"),
        )
        proposed = proposed.localCheckpoint(eager=True)
        changed = proposed.filter(F.col("comp") < F.col("old")).count()
        labels = proposed.select("u", "comp")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("comp").alias("component"))


def canonical_per_component(components: DataFrame) -> DataFrame:
    """Cluster summary: one row per component with its size and the
    canonical (minimum-id) member — the doc a dedup pass would keep."""
    return components.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.min("node").alias("canonical_doc_id"),
    )
