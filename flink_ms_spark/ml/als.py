"""ALS training (SURVEY.md §2.7 M1).

The reference trains FlinkML ALS with defaults iterations=10,
numFactors=10, lambda=0.9, seed=42 (reference ALSImpl.scala:36-49) and
emits user + item factor datasets as ``id,{U|I},f1;f2;...`` text rows.

We train ``pyspark.ml.recommendation.ALS`` (same Zhou et al. blocked
alternating-least-squares family) with the same hyperparameter surface
and produce the canonical model table
``als_model(id STRING, kind STRING, factors ARRAY<DOUBLE>)``.
Numeric parity with FlinkML is not expected (different initialization);
quality is asserted at the MSE level (SURVEY.md §5 ML tier).
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_als(
    ratings: DataFrame,
    rank: int = 10,
    max_iter: int = 10,
    reg_param: float = 0.9,
    seed: int = 42,
    num_blocks: int | None = None,
):
    """Train ALS on a ratings DataFrame (user_id, item_id, rating).

    ``num_blocks`` mirrors the reference's ``setBlocks`` memory knob
    (reference ALSImpl.scala:39-41); on a real cluster it bounds the
    per-task factor block size.
    """
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    if num_blocks is not None:
        als = als.setNumUserBlocks(num_blocks).setNumItemBlocks(num_blocks)
    return als.fit(ratings)


def als_model_table(model) -> DataFrame:
    """Union user and item factors into the canonical model table
    (reference emits the same two datasets as text, ALSImpl.scala:55-62).

    UNION ALL semantics — Flink union does not dedup (SURVEY.md A5).
    """

    def _side(df: DataFrame, kind: str) -> DataFrame:
        return df.select(
            F.col("id").cast("string").alias("id"),
            F.lit(kind).alias("kind"),
            F.transform("features", lambda x: x.cast("double")).alias("factors"),
        )

    return _side(model.userFactors, "U").unionAll(_side(model.itemFactors, "I"))
