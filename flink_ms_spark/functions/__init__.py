from flink_ms_spark.functions.codecs import (  # noqa: F401
    format_model_row,
    model_key,
    parse_factors,
    parse_model_line,
    parse_svm_model_line,
)
from flink_ms_spark.functions.vector import dot, elementwise_mean, vec_axpy  # noqa: F401
