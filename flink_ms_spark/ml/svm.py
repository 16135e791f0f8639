"""Linear SVM training (SURVEY.md §2.7 M2).

The reference trains FlinkML SVM (CoCoA soft-margin, hinge loss) with
defaults blocks=10, iterations=10 (reference SVMImpl.scala:23-29) and
flattens the weight vector to 1-indexed ``featureId,weight`` rows
(SVMImpl.scala:33-35 ``zipWithIndex`` then +1).

We train ``pyspark.ml.classification.LinearSVC`` (hinge loss, OWLQN) and
flatten ``model.coefficients`` the same way. Same-family algorithm;
quality asserted by training accuracy, not weight equality.
"""

from __future__ import annotations

from pyspark.ml.classification import LinearSVC
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def train_svm(train_df: DataFrame, max_iter: int = 10, reg_param: float = 0.01):
    """Train on (label DOUBLE ∈ {0,1}, features Vector)."""
    svc = LinearSVC(maxIter=max_iter, regParam=reg_param)
    return svc.fit(train_df)


def svm_model_table(spark: SparkSession, model) -> DataFrame:
    """M2/T6 — weights → 1-indexed flat model table
    ``svm_model(feature_id INT, weight DOUBLE)``.

    The weight vector is driver-resident (one row per feature is tiny
    next to training data), so parallelize-then-distribute is correct
    even at 100 TB training scale: model size ~ feature count, not data
    size.
    """
    weights = [float(w) for w in model.coefficients]
    df = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(weights)], "feature_id INT, weight DOUBLE"
    )
    return df


def svm_model_ranged(flat: DataFrame, range_size: int = 1000) -> DataFrame:
    """P3/A2/T8 — derive the range-partitioned layout
    ``(bucket, entries MAP<INT,DOUBLE>)`` with bucket = feature_id/range
    (reference SVMImpl.scala:40-45,63-71). Entry order within a bucket is
    defined as sorted-by-id (the reference's group-iterator order is
    nondeterministic — SURVEY.md A2).
    """
    return (
        flat.withColumn("bucket", F.floor(F.col("feature_id") / F.lit(range_size)).cast("int"))
        .groupBy("bucket")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("feature_id", "weight")))
            ).alias("entries")
        )
    )
