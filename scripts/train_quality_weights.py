"""Refresh ml/quality.py's FROZEN_WEIGHTS from the sf0.01 fixture.

Run after changing the weak-label gates or the feature set; paste the
printed tuple into ml/quality.py. Kept as a script (not import-time
training) so the serving query and its oracle stay literal-deterministic.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_ms_spark.ml.quality import (
    quality_feature_frame,
    train_quality_classifier,
    weak_label,
)
from flink_ms_spark.session import get_spark
from flink_ms_spark.sources.tables import load_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")
    spark = get_spark("train-quality", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    weights = train_quality_classifier(docs)
    rounded = tuple(round(w, 6) for w in weights)
    feats = quality_feature_frame(docs).withColumn("label", weak_label())
    pos = feats.where("label = 1.0").count()
    n = feats.count()
    print(f"label balance: {pos}/{n} positive")
    print(f"FROZEN_WEIGHTS = {rounded}")


if __name__ == "__main__":
    main()
