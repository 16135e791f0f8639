"""Batch prediction operators (SURVEY.md §2.7 M3-M5).

The reference answers predictions with per-key state RPCs
(ALSPredict.java:66-83, SVMPredict.java:60-90). Spark-first, prediction
over a batch of queries is a JOIN against the model table — the hash
join probes each model key exactly once per partition, which is the
memoization the reference hand-rolls per group (MSE.java:47-49).

Scale notes: the model table is small relative to the query stream
(|users|+|items| rows, k doubles each), so we broadcast it — no shuffle
of the 100 TB query side. If the model outgrows broadcast range, drop
the hint and let AQE pick a sort-merge join with the model side
pre-bucketed by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.functions.vector import dot


def predict_als_batch(
    queries: DataFrame,
    model: DataFrame,
    broadcast_model: bool = True,
    keep_missing: bool = False,
) -> DataFrame:
    """M3 — score (user_id, item_id) pairs against the ALS model table.

    prediction = Σ u_f[i]·i_f[i] (reference ALSPredict.java:72-83).
    Missing user/item ⇒ row dropped (inner join) unless ``keep_missing``,
    mirroring the clients' key-miss behavior (Optional.empty → no answer,
    QueryClientHelper.java:135-137).
    """
    users = model.where(F.col("kind") == "U").select(
        F.col("id").cast("long").alias("user_id"), F.col("factors").alias("u_factors")
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").cast("long").alias("item_id"), F.col("factors").alias("i_factors")
    )
    if broadcast_model:
        users, items = F.broadcast(users), F.broadcast(items)
    how = "left" if keep_missing else "inner"
    q = queries.withColumn("user_id", F.col("user_id").cast("long")).withColumn(
        "item_id", F.col("item_id").cast("long")
    )
    return (
        q.join(users, "user_id", how)
        .join(items, "item_id", how)
        .withColumn("prediction", dot("u_factors", "i_factors"))
        .drop("u_factors", "i_factors")
    )


def predict_svm_batch(
    query_features: DataFrame,
    model: DataFrame,
    threshold: float = 0.0,
    output_decision_function: bool = False,
    broadcast_model: bool = True,
) -> DataFrame:
    """M4 — score sparse query vectors against the flat SVM model.

    ``query_features`` is the exploded sparse form
    (query_id, feature_id, value). Semantics pinned to the reference
    (SVMPredict.java:71-90): features missing from the model contribute
    0 (left join + coalesce), decision = 1.0 if raw > threshold
    (strict >) else -1.0.

    The ranged layout (M5, RangePartitionSVMPredict.java) is a physical
    optimization of the same logical op — fewer RPCs per query. Under a
    join that collapsing is automatic, so one operator serves both; the
    ranged layout remains available as a storage option
    (ml/svm.py svm_model_ranged).
    """
    m = F.broadcast(model) if broadcast_model else model
    joined = query_features.join(m, "feature_id", "left")
    raw = joined.groupBy("query_id").agg(
        F.sum(
            F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("value")
        ).alias("raw_prediction"),
        F.count("*").alias("n_features"),
    )
    if output_decision_function:
        return raw.withColumn("prediction", F.col("raw_prediction"))
    return raw.withColumn(
        "prediction",
        F.when(F.col("raw_prediction") > F.lit(threshold), F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
