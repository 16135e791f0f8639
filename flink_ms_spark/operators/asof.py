"""Batch as-of join — for each left row, the most recent right row
with ``right.ts <= left.ts`` per key (backward direction).

Spark has no native ASOF JOIN; the naive per-row correlated subquery
(or an unbounded range join) explodes at scale. This uses the
union+window trick: tag both sides, union, then one window per key
ordered by ``(ts, side, right-struct)`` with
``last(..., ignorenulls=True)`` filling each left row with the latest
preceding right row. Cost: ONE shuffle on the key (the window sort),
no join at all — at 100 TB this is the same shape as a sort-merge
join but single-pass; skewed keys take the usual salting treatment.

The right row's value columns travel as ONE struct, so every output
column comes from the SAME matched row even when some right values
are null, and the struct's field order doubles as the tie-break among
equal-timestamp right rows (greatest wins — i.e. exactly
``ORDER BY ts DESC, v1 DESC, ... LIMIT 1`` subquery semantics,
deterministic and engine-independent). Right rows sort before left
rows at equal ts, so the match is ``<=``, not ``<``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + ``<col><suffix>`` columns carrying the most recent
    right row's values at or before each left row's timestamp (null
    when no right row precedes)."""
    other_left = [c for c in left.columns if c != on]
    l = left.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in other_left],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in right_value_cols
            )
            + ">"
        )
        .alias("__r"),
    )
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in other_left],
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).select(
        on,
        *[F.col(f"__l_{c}").alias(c) for c in other_left],
        *[
            F.col("__match").getField(c).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
