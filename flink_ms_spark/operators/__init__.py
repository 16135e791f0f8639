from flink_ms_spark.operators.evaluate import mse  # noqa: F401
from flink_ms_spark.operators.predict import predict_als_batch, predict_svm_batch  # noqa: F401
from flink_ms_spark.operators.sgd import sgd_step  # noqa: F401
