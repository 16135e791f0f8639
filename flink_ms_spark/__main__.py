"""``python -m flink_ms_spark`` — the CLI entry point."""

from flink_ms_spark.cli import main

main()
