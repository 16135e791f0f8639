from flink_ms_spark.streaming.loader import (  # noqa: F401
    run_online_sgd_stream,
    stream_model_into_store,
)
