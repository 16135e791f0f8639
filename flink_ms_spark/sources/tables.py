"""Parquet fixture-table loading.

At 100 TB these reads are the dominant cost, so the rules are:
column pruning and predicate pushdown must reach the scan (callers
``select``/``filter`` on the returned DataFrame and Catalyst pushes both
into the parquet reader), and no ``.cache()`` by default — caching a
100 TB scan is a bug, not an optimization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_ms_spark.schemas import FIXTURE_TABLES


# Physical types the catalog's SQL depends on. The driver regenerates
# the fixtures and has changed types before (events.ts was
# TIMESTAMP(NANOS)-as-BIGINT, then became TIMESTAMP(MICROS)) — a wrong
# type here silently poisons epoch arithmetic in dozens of queries, so
# drift fails fast with a named error instead. Only load-bearing
# columns are pinned; added columns are fine.
_CRITICAL_TYPES: dict[str, dict[str, tuple[str, ...]]] = {
    "events": {
        # event_id/user_id feed synthetic-model arithmetic (`% N`,
        # `CAST(... AS INT)`) — a float/decimal drift breaks truncation
        "event_id": ("bigint", "int"),
        "user_id": ("bigint", "int"),
        "ts": ("timestamp", "timestamp_ntz"),
        "event_type": ("string",),
        "value": ("double",),
        "props": ("string",),
    },
    "documents": {
        "doc_id": ("bigint", "int"),
        "text": ("string",),
        "lang": ("string",),
        "source": ("string",),
        # quality_blend's length percentile reads the materialized
        # count; a fixture regen that turns it float would silently
        # shift rank ties
        "n_chars": ("bigint", "int"),
    },
    "embeddings": {
        "vec_id": ("bigint", "int"),
        "embedding": ("array<float>", "array<double>"),
        "label": ("int", "bigint"),
    },
    "orders": {
        "o_orderkey": ("bigint", "int"),
        "o_custkey": ("bigint", "int"),
        "o_totalprice": ("double",),
        "o_orderdate": ("timestamp", "timestamp_ntz"),
    },
    "lineitem": {
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_tax": ("double",),
        "l_shipdate": ("timestamp", "timestamp_ntz"),
    },
    "customer": {"c_custkey": ("bigint", "int"), "c_acctbal": ("double",)},
    "supplier": {"s_suppkey": ("bigint", "int"), "s_acctbal": ("double",)},
    "part": {"p_partkey": ("bigint", "int"), "p_retailprice": ("double",)},
}


# Schema catalog: `spark.read.parquet(path)` infers the schema EAGERLY
# (a driver-side footer read per call, ~tens of ms). Every query
# invocation re-loads its tables, and the SQL-registered queries load
# all ten fixture views per call, so footer inference was a measured
# driver-side tax on every benched rep (r14 profile: SQL queries spent
# 0.3-1.4 s/call in registration while their executors sat idle). A
# real engine serves schemas from a metastore; this cache is that
# catalog, keyed on (absolute path, mtime_ns, size) so a regenerated
# fixture invalidates itself. Only METADATA is cached — every query
# still scans the parquet data on every run.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}


def _schema_key(path: str) -> tuple | None:
    # NOTE: the directory branch uses the process-salted builtin
    # hash() — fine for this in-process cache, NOT stable across runs;
    # never persist these keys. st_ino is part of the key so a file
    # COPIED over the fixture with preserved timestamps (same mtime_ns
    # and size) still invalidates — the one hole ADVICE r14 flagged in
    # the mtime/size key.
    try:
        st = os.stat(path)
    except OSError:
        return None  # let the reader raise its own error
    if os.path.isdir(path):
        # directory datasets: fold entry names/mtimes into the key so
        # added/rewritten part-files invalidate
        ent = sorted(
            (e.name, e.stat().st_mtime_ns, e.stat().st_size, e.inode())
            for e in os.scandir(path)
        )
        return (os.path.abspath(path), hash(tuple(ent)), st.st_size)
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size, st.st_ino)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver may hand us its OWN SparkSession: all epoch math
    # (unix_micros, window(), datediff) assumes UTC, and the DuckDB
    # oracles compare against naive-UTC epochs — pin it here, not only
    # in the session factory. (Runtime-settable conf, cheap to re-set.)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Fixture timestamps are TIMESTAMP(MICROS); no reader conf needed.
    # (A NANOS fixture would fail loudly at scan time — deliberately no
    # nanosAsLong fallback, which would silently hand queries a BIGINT.)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = _schema_key(path)
    cached = _SCHEMA_CACHE.get(key) if key is not None else None
    if cached is not None:
        # validated at insert for this exact file state (path, mtime,
        # size, inode) — re-run the critical-type guard anyway (dict
        # comparison, ADVICE r14) so the forced schema can never
        # silently serve a table the CURRENT catalog assumptions
        # reject, then skip the eager footer inference
        _check_critical_types(name, cached)
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    _check_critical_types(name, df.schema)
    if key is not None:
        _SCHEMA_CACHE[key] = df.schema
    return df


def _check_critical_types(name: str, schema) -> None:
    expected = _CRITICAL_TYPES.get(name)
    if not expected:
        return
    actual = {f.name: f.dataType.simpleString() for f in schema.fields}
    for col, allowed in expected.items():
        got = actual.get(col)
        if got is None:
            # the WORST drift — a load-bearing column renamed or
            # dropped — must fail here, not as a deep-plan
            # AnalysisException three operators later
            raise TypeError(
                f"fixture drift: {name}.{col} is MISSING from the "
                f"regenerated fixture (have: {sorted(actual)})"
            )
        if got not in allowed:
            raise TypeError(
                f"fixture drift: {name}.{col} is {got}, catalog assumes "
                f"{'/'.join(allowed)} — regenerated testdata changed "
                f"physical types; fix plans/ before trusting results"
            )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in FIXTURE_TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register fixture tables as temp views for spark.sql use.

    ``only`` restricts registration to the named tables — the SQL
    registry passes each query's referenced tables so a 2-table query
    does not pay ten view registrations per invocation (false
    positives in the reference scan are harmless: an extra view is
    just an extra catalog entry)."""
    for t in FIXTURE_TABLES:
        if only is not None and t not in only:
            continue
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
