"""Synthetic model generators for scale/latency testing (SURVEY.md §2.3
T10; reference: model-generator/.../ALSModelGenerator.scala:28-32,
SVMModelGenerator.scala:26-52 — "only for testing the latency and
throughput. Not for quality").

Distribution-shape parity, not bitwise parity (the reference uses
``scala.util.Random`` with no fixed seed — its own runs aren't
reproducible). Ours ARE reproducible: every random draw is a
deterministic hash of (seed, id, kind, j), so the same call yields the
same model on any cluster at any parallelism — which is what you want
when a 1000-executor latency test must be re-runnable.

- ALS rows: factor_j = u1/u2 * k, the reference's ratio-of-uniforms
  (heavy right tail, ALSModelGenerator.scala:29-31).
- SVM rows: 50% exact zeros, else uniform in [-10, 10] (the recursive
  bisection in SVMModelGenerator.scala:33-52 is a dyadic approximation
  of uniform; we use the uniform it approximates).

Everything is ``spark.range`` + hash expressions — no driver-side
loops, no Python; generating 10^9 synthetic rows is a map-only job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 1_000_000_007  # prime modulus for hash→uniform


def _uniform(seed: int, *cols: Column) -> Column:
    """Deterministic U(0,1) from a hash of (seed, cols) — in (0, 1)
    exclusive so it is safe as a ratio denominator."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(_M)) + 0.5) / F.lit(float(_M))


def generate_als_model(
    spark: SparkSession,
    num_users: int,
    num_items: int,
    latent_factors: int,
    seed: int = 42,
    parallelism: int = 2,
) -> DataFrame:
    """Canonical model table (id STRING, kind, factors ARRAY<DOUBLE>):
    users 1..num_users kind U, items 1..num_items kind I (reference ids
    start at 1, ALSModelGenerator.scala:46-51)."""

    def u(kind: str, j: str, salt: int) -> str:
        # SQL-string expr (not python-lambda transform: see
        # plans/synthetic.py on the Catalyst DeduplicateRelations bug)
        return (
            f"(pmod(xxhash64({seed}L, id, '{kind}', {j}, {salt}), {_M}) + 0.5)"
            f" / CAST({_M} AS DOUBLE)"
        )

    def side(n: int, kind: str) -> DataFrame:
        # map-only: factors built per-row with a transform expression,
        # no shuffle at any parallelism
        factors = F.expr(
            f"transform(sequence(1, {latent_factors}), j -> "
            f"{u(kind, 'j', 1)} / {u(kind, 'j', 2)} * {latent_factors})"
        )
        return spark.range(1, n + 1, numPartitions=parallelism).select(
            F.col("id").cast("string").alias("id"),
            F.lit(kind).alias("kind"),
            factors.alias("factors"),
        )

    return side(num_users, "U").unionAll(side(num_items, "I"))


def generate_svm_model(
    spark: SparkSession,
    num_features: int,
    seed: int = 42,
    parallelism: int = 2,
) -> DataFrame:
    """Flat SVM model (feature_id 1..num_features, weight DOUBLE):
    50% exact zeros, else uniform [-10, 10]
    (SVMModelGenerator.scala:33-38)."""
    ids = spark.range(1, num_features + 1, numPartitions=parallelism).select(
        F.col("id").cast("int").alias("feature_id")
    )
    is_zero = _uniform(seed, F.col("feature_id"), F.lit(0)) < 0.5
    w = _uniform(seed, F.col("feature_id"), F.lit(1)) * 20.0 - 10.0
    return ids.select(
        "feature_id", F.when(is_zero, F.lit(0.0)).otherwise(w).alias("weight")
    )


def als_model_text_rows(model: DataFrame) -> DataFrame:
    """Reference text format ``id,KIND,f1;f2;...`` (T5) — the shape the
    serving pipeline ingests."""
    from flink_ms_spark.functions.codecs import format_model_row

    return model.select(format_model_row("id", "kind", "factors").alias("value"))
