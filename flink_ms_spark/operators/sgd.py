"""Online SGD matrix-factorization update (SURVEY.md §2.7 M6/M7/M9, §2.3 T7).

Reference semantics (SGD.java:160-234), adopted exactly:

- error ``e = r − u·i``
- simultaneous update (both updates read PRE-update factors —
  SGD.java:199-207): ``u' = u + η(e·i − λu·u)``, ``i' = i + η(e·u − λi·i)``.
  SGDV0's sequential variant (SGDV0.java:188-197 mutates the user vector
  in place first, so the item update sees POST-update user factors:
  ``i' = i + η(e·u' − λi·i)``) is available via ``sequential=True`` —
  the semantic fork is documented in SURVEY.md M6; SGD.java is default.
- cold-start fallback: missing user/item factors ⇒ mean vector
  (MEAN-U / MEAN-I; SGD.java:140-151,219-234) — left join + coalesce.
- NaN guard: drop update rows containing NaN (SGDV0.java:206-226
  behavior, adopted per SURVEY.md M9).
- one input produces two output rows (user row + item row) — T7's
  double-collect, expressed as explode of a 2-struct array.

Batch-vs-reference consistency: the reference applies updates per record
through its Kafka→state loop (eventually consistent); we apply one
micro-batch at a time — within a batch every update reads the same model
snapshot, and duplicate keys in a batch resolve last-write-wins by input
order (max input ordinal), matching per-key arrival order.

Scale: the join shuffles the *ratings batch* by user then item while the
model is broadcast; update aggregation shuffles by key only. No
driver-side loops; all arithmetic is codegen'd zip_with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.functions.vector import dot, has_nan


def sgd_step(
    ratings: DataFrame,
    model: DataFrame,
    user_mean: DataFrame | None = None,
    item_mean: DataFrame | None = None,
    learning_rate: float = 0.1,
    user_reg: float = 0.0,
    item_reg: float = 0.0,
    broadcast_model: bool = True,
    ordinal_col: str | None = None,
    sequential: bool = False,
) -> DataFrame:
    """One SGD micro-batch → updated model rows (id, kind, factors).

    ``ratings``: (user_id, item_id, rating). ``model``: canonical model
    table. ``user_mean``/``item_mean``: optional 1-row (factors) frames
    (M7 fallback; reference defaults η=0.1, λu=λi=0.0, SGD.java:33-36).
    Output contains one U row and one I row per input rating (post
    NaN-drop), deduped last-write-wins per key when a key repeats.
    """
    eta, lu, li = F.lit(learning_rate), F.lit(user_reg), F.lit(item_reg)

    users = model.where(F.col("kind") == "U").select(
        F.col("id").alias("user_id"), F.col("factors").alias("u")
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").alias("item_id"), F.col("factors").alias("i")
    )
    if broadcast_model:
        users, items = F.broadcast(users), F.broadcast(items)

    # ordinal for last-write-wins: caller-provided (source offset — fully
    # deterministic) or input order within the batch
    ord_expr = (
        F.col(ordinal_col) if ordinal_col is not None else F.monotonically_increasing_id()
    )
    r = ratings.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("item_id").cast("string").alias("item_id"),
        F.col("rating").cast("double").alias("rating"),
        ord_expr.alias("_ord"),
    )
    joined = r.join(users, "user_id", "left").join(items, "item_id", "left")

    # M7 cold-start: coalesce missing factors with the mean vectors.
    if user_mean is not None:
        um = F.broadcast(user_mean.select(F.col("factors").alias("um"))).hint("broadcast")
        joined = joined.crossJoin(um).withColumn("u", F.coalesce("u", "um")).drop("um")
    if item_mean is not None:
        im = F.broadcast(item_mean.select(F.col("factors").alias("im")))
        joined = joined.crossJoin(im).withColumn("i", F.coalesce("i", "im")).drop("im")
    # Hard error parity: reference aborts when factors are missing and no
    # mean is available (SGD.java:147-151) — here those rows are dropped
    # and counted by the caller if needed.
    joined = joined.where(F.col("u").isNotNull() & F.col("i").isNotNull())

    e = (F.col("rating") - dot("u", "i")).alias("e")
    joined = joined.withColumn("e", e)

    u_new = F.zip_with("u", "i", lambda uf, itf: uf + eta * (F.col("e") * itf - lu * uf))
    if sequential:
        # SGDV0: item update reads the POST-update user vector
        joined = joined.withColumn("u_upd", u_new)
        u_new = F.col("u_upd")
        i_new = F.zip_with(
            "i", "u_upd", lambda itf, uf: itf + eta * (F.col("e") * uf - li * itf)
        )
    else:
        # SGD.java: simultaneous — both expressions read pre-update u/i
        i_new = F.zip_with(
            "i", "u", lambda itf, uf: itf + eta * (F.col("e") * uf - li * itf)
        )
    updated = joined.select(
        "_ord",
        F.explode(
            F.array(
                F.struct(F.col("user_id").alias("id"), F.lit("U").alias("kind"), u_new.alias("factors")),
                F.struct(F.col("item_id").alias("id"), F.lit("I").alias("kind"), i_new.alias("factors")),
            )
        ).alias("row"),
    ).select("_ord", "row.id", "row.kind", "row.factors")

    # M9 NaN guard (SGDV0 drop behavior).
    updated = updated.where(~has_nan("factors"))

    # Last-write-wins per key within the batch (per-key arrival order).
    w = F.struct(F.col("_ord").alias("o"), F.col("factors").alias("f"))
    return (
        updated.groupBy("id", "kind")
        .agg(F.max(w).alias("last"))
        .select("id", "kind", F.col("last.f").alias("factors"))
    )
