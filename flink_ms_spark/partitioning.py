"""Physical-layout helpers.

``fan_out`` guards map-heavy per-row operators (shingle explodes,
hash fan-outs, Arrow decode batches) against under-partitioned inputs.
On a real cluster reading 100 TB the scan already yields thousands of
splits and this is a no-op; locally (or after a collapsing coalesce) a
single small parquet file arrives as ONE partition and a 32-core
machine would run the whole explode on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``target`` (default: cluster
    parallelism) — only when the input has fewer partitions; never
    shrinks, never shuffles an already-parallel input."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
