"""Salted equi-join — explicit skew mitigation for hot keys.

A shuffle join partitions both sides by the join key, so one hot key
(a celebrity user, a default/sentinel id, an empty-string bucket)
lands its ENTIRE row mass in one task: the stage runs at the speed of
that straggler and can OOM it. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles many cases at runtime, but
it only triggers on sort-merge joins whose partition stats cross its
thresholds — a pipeline that KNOWS its keys are Zipfian (see
``key_skew_report``) can salt deterministically and not depend on it.

The classic construction, DataFrame-native:

- FACT side: add ``_salt = f(row) mod n_salts`` — any deterministic
  row-local expression with spread (default: xxhash64 over all fact
  columns). The hot key's rows now span ``n_salts`` partitions.
- DIM side: replicate each row ``n_salts`` times (explode over
  ``sequence(0, n_salts-1)``) — the dim is small relative to the
  fact's hot keys (that's WHY its rows can be replicated), so the
  blow-up is bounded and map-side.
- Join on ``(key, _salt)``: same matches as the plain join — every
  fact row still meets its dim row exactly once (at its own salt) —
  but the hot key's work is spread ``n_salts`` ways.

Result equality with the unsalted join is pinned in
tests/test_skewjoin.py; the ``skew_salted_join`` catalog query runs
the full construction against a DuckDB plain-join oracle.

Parity note vs the reference (mmziyad/flink-ms): the reference has no
join operator at all (its only keyed rendezvous is ValueState lookup,
ALSKafkaConsumer.java:84-92); this module is part of the relational
widening the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    salt_expr: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with ``n_salts``-way salting.

    ``salt_expr`` must be deterministic and row-local (defaults to
    xxhash64 over every fact column). ``how`` supports the fact-
    preserving joins (inner / left) — a right/full join would need the
    dim side de-replicated and is not what salting is for.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("fact", fact), ("dim", dim)):
        if "_salt" in df.columns:
            # withColumn would silently REPLACE a caller's _salt column
            # and the final drop would erase it from the result —
            # corrupting data is worse than refusing (ADVICE r10)
            raise ValueError(
                f"salted_join: {side} side already has a '_salt' column "
                "— rename it before salting"
            )
    keys = [on] if isinstance(on, str) else list(on)
    if salt_expr is None:
        salt_expr = F.xxhash64(*[F.col(c) for c in fact.columns])
    salted_fact = fact.withColumn(
        "_salt", F.pmod(salt_expr, F.lit(n_salts)).cast("int")
    )
    # sequence over int literals yields array<int>, matching the fact
    # side's int salt (a generator cannot be nested inside a cast)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(replicated_dim, keys + ["_salt"], how).drop(
        "_salt"
    )
