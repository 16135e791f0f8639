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
        # Python worker daemon wrapper (flink_ms_spark/pydaemon.py):
        # skips the unconditional per-task importlib.invalidate_caches()
        # in worker_util.setup_spark_files when no new py-files were
        # shipped — the purge forces ~16 zip-central-directory re-reads
        # per task (pyspark.zip, py4j, the spark-core jar), measured as
        # a 120-230 ms floor on EVERY Python task at any input size.
        # Scale-relevant on any cluster (the purge runs per task per
        # worker everywhere); falls back to stock behavior if pyspark
        # internals drift (see pydaemon docstring).
        .config("spark.python.daemon.module", "flink_ms_spark.pydaemon")
        # the daemon subprocess needs the package importable: propagate
        # this package's parent dir into the workers' PYTHONPATH
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p
                for p in (
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                )
                if p
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
