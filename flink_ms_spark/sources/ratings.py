"""Deterministic ratings derivation from the driver fixture tables.

FIXTURES.md maps the reference's rating record
(``userId<sep>itemId<sep>rating``) onto ``events.parquet``:
user_id from events, item_id = event_id % 200, rating = value clamped
to a small positive range. Pure column expressions → same rows in Spark
and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark.sources.tables import load_table

# Keep in sync with RATINGS_ORACLE_SQL below and oracle tests.
N_ITEMS = 200


def ratings_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("int").alias("user_id"),
        (F.col("event_id") % N_ITEMS).cast("int").alias("item_id"),
        # clamp to [0, 5] so it behaves like a rating scale
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(5.0)).alias("rating"),
    )


RATINGS_ORACLE_SQL = (
    "SELECT CAST(user_id AS INT) AS user_id, "
    f"CAST(event_id % {N_ITEMS} AS INT) AS item_id, "
    "LEAST(GREATEST(value, 0.0), 5.0) AS rating FROM events"
)
