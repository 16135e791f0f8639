from flink_ms_spark.ml.als import als_model_table, train_als  # noqa: F401
from flink_ms_spark.ml.svm import svm_model_table, train_svm  # noqa: F401
