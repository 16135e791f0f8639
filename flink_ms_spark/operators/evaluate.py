"""Model evaluation (SURVEY.md §2.7 M8, §2.4 A3/A4).

The reference's MSE job groups ratings by user, fetches user factors
once per group and item factors per record via state RPCs, skipping
users/items absent from the model, then averages squared error
(MSE.java:46-69,122-159). Inner joins reproduce both the skip semantics
(absent key ⇒ no row) and the per-key fetch memoization (hash join
probes the built table once per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.operators.predict import predict_als_batch


def mse(ratings: DataFrame, model: DataFrame, broadcast_model: bool = True) -> DataFrame:
    """M8 — 1-row DataFrame ``(mse DOUBLE, n BIGINT)`` over scored pairs.

    Denominator counts only pairs where both user and item exist in the
    model — reference skip-on-miss behavior (MSE.java:128-148 ``break`` /
    ``continue``).
    """
    scored = predict_als_batch(ratings, model, broadcast_model=broadcast_model)
    return scored.agg(
        F.avg(F.pow(F.col("rating") - F.col("prediction"), F.lit(2))).alias("mse"),
        F.count(F.lit(1)).alias("n"),
    )
