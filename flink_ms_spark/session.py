"""SparkSession factory.

Single place where execution configuration lives, so every entry point
(tests, bench, driver contract) gets the same scale-aware settings.

The settings are chosen for the 100 TB design point, not just local[32]:

- AQE on (runtime re-plan: coalesce post-shuffle partitions, convert
  sort-merge to broadcast when a side turns out small, split skewed
  partitions). At 1000 executors AQE is what keeps a static
  ``shuffle.partitions`` guess from being a bottleneck.
- Arrow enabled for every pandas interchange (the multimodal / fallback
  UDF path) — row-at-a-time Python serialization is never acceptable.
- Shuffle partitions default to the local core count; on a real cluster
  this is overridden (AQE coalescing makes the initial number mostly a
  ceiling, not a target).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flink-ms-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Model tables at reference scale are small relative to fact
        # tables; let Spark broadcast aggressively (AQE re-checks at
        # runtime with actual sizes).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
