from flink_ms_spark.serving.store import ModelStore  # noqa: F401
