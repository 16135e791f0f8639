"""Deterministic synthetic model fixtures shared by the oracle queries.

The reference's relational operators act on trained-model tables; for
oracle testing we need *deterministic* factors both Spark and DuckDB can
compute bit-identically. Factor formula (pure integer arithmetic + one
IEEE division — identical bits in any IEEE-754 engine):

    factor(id, kind, j) = ((id*31 + j*17 + off(kind)) % 97) / 97.0 - 0.5
    off(U) = 0, off(I) = 7

Users 0..N_USERS-1, items 0..N_ITEMS-1, K factors; SVM weights use the
same formula with kind 'W' (off 3) over feature ids 1..N_FEATURES.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_USERS = 120  # deliberately < the 150 fixture users → exercises key misses
N_ITEMS = 200
K = 8
N_SVM_FEATURES = 64  # matches embedding dim
KIND_OFFSET = {"U": 0, "I": 7, "W": 3}


def factor_expr(id_col: Column, j: Column, offset: int) -> Column:
    return ((id_col * 31 + j * 17 + F.lit(offset)) % 97) / F.lit(97.0) - F.lit(0.5)


def factors_array(id_sql: str, offset: int, k: int = K) -> Column:
    """Factor array as a SQL-string expr. (String, not python-lambda
    ``F.transform``: lambda-captured columns trip a Catalyst
    DeduplicateRelations bug when the resulting union is later
    self-joined — 'key not found: id#N'.)"""
    # CAST(... AS DOUBLE): a bare `97.0` literal is DECIMAL in SQL and
    # silently turns the whole expression into decimal arithmetic
    return F.expr(
        f"transform(sequence(1, {k}), j -> "
        f"(({id_sql}*31 + j*17 + {offset}) % 97) / CAST(97 AS DOUBLE) - CAST(0.5 AS DOUBLE))"
    )


def synthetic_als_model(spark: SparkSession) -> DataFrame:
    """Canonical model table (id STRING, kind, factors ARRAY<DOUBLE>)."""
    users = spark.range(0, N_USERS).select(
        F.col("id").cast("string").alias("id"),
        F.lit("U").alias("kind"),
        factors_array("id", KIND_OFFSET["U"]).alias("factors"),
    )
    items = spark.range(0, N_ITEMS).select(
        F.col("id").cast("string").alias("id"),
        F.lit("I").alias("kind"),
        factors_array("id", KIND_OFFSET["I"]).alias("factors"),
    )
    return users.unionAll(items)


def synthetic_svm_model(spark: SparkSession, odd_only: bool = True) -> DataFrame:
    """Flat SVM model (feature_id 1..N, weight). ``odd_only`` keeps only
    odd feature ids so predictions exercise missing-feature-as-0."""
    df = spark.range(1, N_SVM_FEATURES + 1).select(
        F.col("id").cast("int").alias("feature_id"),
        factor_expr(F.col("id"), F.lit(1), KIND_OFFSET["W"]).alias("weight"),
    )
    if odd_only:
        df = df.where(F.col("feature_id") % 2 == 1)
    return df


# ---------------------------------------------------------------------------
# DuckDB fragments (same formulas, DuckDB syntax). Used as CTEs inside
# oracle SQL strings.

DUCK_FACTOR = (
    "((({id}) * 31 + ({j}) * 17 + {off}) % 97) / CAST(97 AS DOUBLE) - CAST(0.5 AS DOUBLE)"
)


def duck_factor(id_expr: str, j_expr: str, kind: str) -> str:
    return DUCK_FACTOR.format(id=id_expr, j=j_expr, off=KIND_OFFSET[kind])


DUCK_ALS_MODEL_CTE = f"""
als_users AS (
  SELECT CAST(u.id AS VARCHAR) AS id, 'U' AS kind, u.id AS iid
  FROM (SELECT unnest(generate_series(0, {N_USERS - 1})) AS id) u),
als_items AS (
  SELECT CAST(i.id AS VARCHAR) AS id, 'I' AS kind, i.id AS iid
  FROM (SELECT unnest(generate_series(0, {N_ITEMS - 1})) AS id) i),
als_model AS (
  SELECT id, kind, iid FROM als_users UNION ALL SELECT id, kind, iid FROM als_items)
"""

DUCK_SVM_MODEL_CTE = f"""
svm_model AS (
  SELECT CAST(f.id AS INT) AS feature_id,
         {duck_factor('f.id', '1', 'W')} AS weight
  FROM (SELECT unnest(generate_series(1, {N_SVM_FEATURES})) AS id) f
  WHERE f.id % 2 = 1)
"""
