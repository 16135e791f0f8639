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
    # The fixture files carry TIMESTAMP(NANOS) columns, which Spark's
    # parquet reader rejects unless this (runtime-settable) conf is on;
    # with it, nanos read as TIMESTAMP_NTZ truncated to micros — the
    # same naive-timestamp semantics DuckDB gives, so oracle results
    # agree. Set here, not only in the session factory, because the
    # driver may hand us its own SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
