"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end slice (SURVEY.md §7 step 2):
fixture ratings → ALS train → canonical model table → join-based batch
predict → MSE evaluation.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (+ north-star ops), DuckDB-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_ms_spark.ml.als import als_model_table, train_als
from flink_ms_spark.operators.evaluate import mse
from flink_ms_spark.plans.catalog import QUERIES
from flink_ms_spark.plans.registry import resolve_oracles
from flink_ms_spark.sources.ratings import ratings_from_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    ratings = ratings_from_events(spark, sf_dir)
    model = train_als(ratings, rank=10, max_iter=10, reg_param=0.1, seed=42)
    table = als_model_table(model)
    return mse(ratings, table)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # Deferred oracles (fixture-derived constants, e.g. k-means
    # centroid literals) materialize here, seeing the CURRENT fixture.
    return resolve_oracles()
