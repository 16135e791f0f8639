"""Banded (time-)range join — the scale pattern for non-equi joins.

Spark has no range-join strategy: a bare ``ON r.ts BETWEEN l.ts-Δ AND
l.ts`` plans as BroadcastNestedLoopJoin (quadratic work, driver-bound
broadcast) or a full cartesian. The standard rewrite is to quantize
time into buckets of width B ≥ the band width: the right side maps to
ONE bucket (ts div B), the left side explodes to the few buckets its
band can touch, the join becomes an EQUI join on bucket (hash shuffle,
AQE-skew-splittable), and the exact band predicate filters the
bucket-coarse candidates. Candidate inflation is bounded by
ceil(band/B)+1 per left row — with B = band width, ≤ 2×.

Reference scope: the reference has no range join; this backs the
north-star `preceding_5min_count` query and is the batch twin of the
stream-stream interval join (`streaming/joins.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bucket: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left × right) rows with ``right_ts`` in the half-open band
    ``[left_ts + lower, left_ts + upper)`` — timestamps and bounds in
    the same integer unit (e.g. epoch micros). Column names must be
    disjoint (pre-alias). ``bucket`` defaults to the band width.

    Inner join only: the bucket explode duplicates left rows and the
    post-join band predicate drops null-extended rows, so a naive
    ``how='left'`` would silently degenerate to inner semantics (and
    duplicate matched rows). An outer band join is this inner join
    plus a left_anti complement of the unmatched left rows —
    compose it explicitly if needed."""
    if how != "inner":
        raise NotImplementedError(
            "banded_range_join supports inner only; for left semantics "
            "union this result with left.join(matches, keys, 'left_anti')"
        )
    bucket = bucket or max(upper - lower, 1)
    lo_b = F.expr(f"({left_ts} + {lower}) div {bucket}")
    hi_b = F.expr(f"({left_ts} + {upper}) div {bucket}")
    l = left.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    r = right.withColumn("__b", F.expr(f"{right_ts} div {bucket}"))
    j = l.join(r, "__b", how).where(
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
        & (F.col(right_ts) < F.col(left_ts) + F.lit(upper))
    )
    return j.drop("__b")
