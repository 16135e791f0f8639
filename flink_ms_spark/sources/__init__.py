from flink_ms_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
from flink_ms_spark.sources.text import (  # noqa: F401
    read_csv_ratings,
    read_libsvm,
    read_recursive_text,
    read_text,
)
