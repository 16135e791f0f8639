"""Compatibility shim: the harness moved into the package so the
`verify` CLI shares it; tests keep their historical import path."""

from flink_ms_spark.oracle import (  # noqa: F401
    canonical_rows,
    compare,
    duckdb_result,
)
