"""Parquet fixture-table loading.

At 100 TB these reads are the dominant cost, so the rules are:
column pruning and predicate pushdown must reach the scan (callers
``select``/``filter`` on the returned DataFrame and Catalyst pushes both
into the parquet reader), and no ``.cache()`` by default — caching a
100 TB scan is a bug, not an optimization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_ms_spark.schemas import FIXTURE_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Fixture timestamps are TIMESTAMP(MICROS); no reader conf needed.
    # (A NANOS fixture would fail loudly at scan time — deliberately no
    # nanosAsLong fallback, which would silently hand queries a BIGINT.)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
