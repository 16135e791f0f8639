"""Batch prediction operators (SURVEY.md §2.7 M3-M5).

The reference answers predictions with per-key state RPCs
(ALSPredict.java:66-83, SVMPredict.java:60-90). Spark-first, prediction
over a batch of queries is a JOIN against the model table — the hash
join probes each model key exactly once per partition, which is the
memoization the reference hand-rolls per group (MSE.java:47-49).

Scale notes: the model table is small relative to the query stream
(|users|+|items| rows, k doubles each), so we broadcast it — no shuffle
of the 100 TB query side. If the model outgrows broadcast range, drop
the hint and let AQE pick a sort-merge join with the model side
pre-bucketed by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.functions.vector import dot


def predict_als_batch(
    queries: DataFrame,
    model: DataFrame,
    broadcast_model: bool = True,
    keep_missing: bool = False,
) -> DataFrame:
    """M3 — score (user_id, item_id) pairs against the ALS model table.

    prediction = Σ u_f[i]·i_f[i] (reference ALSPredict.java:72-83).
    Missing user/item ⇒ row dropped (inner join) unless ``keep_missing``,
    mirroring the clients' key-miss behavior (Optional.empty → no answer,
    QueryClientHelper.java:135-137).
    """
    users = model.where(F.col("kind") == "U").select(
        F.col("id").cast("long").alias("user_id"), F.col("factors").alias("u_factors")
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").cast("long").alias("item_id"), F.col("factors").alias("i_factors")
    )
    if broadcast_model:
        users, items = F.broadcast(users), F.broadcast(items)
    how = "left" if keep_missing else "inner"
    q = queries.withColumn("user_id", F.col("user_id").cast("long")).withColumn(
        "item_id", F.col("item_id").cast("long")
    )
    return (
        q.join(users, "user_id", how)
        .join(items, "item_id", how)
        .withColumn("prediction", dot("u_factors", "i_factors"))
        .drop("u_factors", "i_factors")
    )


def recommend_topn(
    users: DataFrame,
    items: DataFrame,
    n: int = 3,
    blocked: bool = False,
    n_user_blocks: int = 8,
    n_item_blocks: int = 8,
) -> DataFrame:
    """recommendForAllUsers-shape serving: score every user against
    every item, keep each user's top ``n`` by (rounded score desc,
    item_id asc). Inputs: ``users`` (user_id INT, factors
    ARRAY<DOUBLE>), ``items`` (item_id INT, factors ARRAY<DOUBLE>).
    Output: (user_id, item_id, prediction DOUBLE round-6, rk INT).

    Two physical forms, identical results (pinned in
    tests/test_predict_blocked.py):

    - ``blocked=False`` (default): broadcast the item factors and score
      user×items per user row — right when items fit in a broadcast
      (the reference's serving reality: model ≪ traffic).
    - ``blocked=True``: the model-scale form — NO cartesian. Users are
      hash-assigned to ``n_user_blocks`` and replicated across item
      blocks via a map-side explode (and vice versa), then each
      (user_block, item_block) cell does ONE numpy matmul inside a
      cogrouped applyInPandas, emitting only its per-user top-n
      candidates. The global top-n window then ranks
      users × n_item_blocks × n candidate rows — a shuffle of the
      candidate set, never of the users×items cross product. Each
      side's replication factor is the OTHER side's block count, so
      total shuffled volume is |U|·B_i + |I|·B_u rows — the standard
      block-matrix trade (MLlib's recommendForAll blockify does the
      same); tune block counts so one cell's U·Iᵀ fits executor memory.
    """
    from pyspark.sql.window import Window

    if not blocked:
        # rename factor columns first: both sides often derive from the
        # same model frame, and a self-crossJoin on one lineage makes
        # bare `factors` ambiguous
        uf = users.select("user_id", F.col("factors").alias("_uf"))
        itf = items.select("item_id", F.col("factors").alias("_if"))
        scored = uf.crossJoin(F.broadcast(itf)).select(
            "user_id",
            "item_id",
            F.round(dot("_uf", "_if"), 6).alias("prediction"),
        )
    else:
        import numpy as np
        import pandas as pd

        # per-side factor renames BEFORE blocking: users and items
        # usually derive from ONE model frame, so both sides share the
        # `factors` attribute id — a projection added above the
        # cogroup then lets the optimizer dedup/prune the shared
        # attribute out of one side's UDF input (KeyError in the
        # worker). Distinct names make the two inputs unambiguous,
        # exactly as the broadcast branch already does.
        u = users.select(
            "user_id", F.col("factors").alias("_uf")
        ).withColumn(
            "_ub", F.pmod(F.col("user_id"), n_user_blocks).cast("int")
        ).withColumn(
            "_ib", F.explode(F.sequence(F.lit(0), F.lit(n_item_blocks - 1)))
        )
        i = items.select(
            "item_id", F.col("factors").alias("_if")
        ).withColumn(
            "_ib", F.pmod(F.col("item_id"), n_item_blocks).cast("int")
        ).withColumn(
            "_ub", F.explode(F.sequence(F.lit(0), F.lit(n_user_blocks - 1)))
        )

        def score_cell(u_pdf: pd.DataFrame, i_pdf: pd.DataFrame) -> pd.DataFrame:
            cols = ["user_id", "item_id", "prediction"]
            if u_pdf.empty or i_pdf.empty:
                return pd.DataFrame(columns=cols)
            mat_u = np.asarray(u_pdf["_uf"].tolist(), dtype=np.float64)
            mat_i = np.asarray(i_pdf["_if"].tolist(), dtype=np.float64)
            s = mat_u @ mat_i.T
            # emit RAW scores and prune with a margin; the ONE F.round
            # below applies Spark's exact HALF_UP-on-shortest-repr to
            # both physical forms. (A numpy emulation —
            # sign*floor(abs*1e6+0.5) — rounds the BINARY value, which
            # diverges from BigDecimal.valueOf on 2.675-style doubles,
            # so the two forms could return different item sets.) The
            # margin keeps every candidate whose rounded score could
            # still reach the in-cell top-n across a 1e-6 boundary.
            item_ids = i_pdf["item_id"].to_numpy()
            margin = n + 8
            out = []
            for row in range(s.shape[0]):
                keep = np.lexsort((item_ids, -s[row]))[:margin]
                uid = int(u_pdf["user_id"].iloc[row])
                out.extend(
                    (uid, int(item_ids[j]), float(s[row, j])) for j in keep
                )
            return pd.DataFrame(out, columns=cols)

        scored = (
            u.groupBy("_ub", "_ib")
            .cogroup(i.groupBy("_ub", "_ib"))
            .applyInPandas(
                score_cell, "user_id INT, item_id INT, prediction DOUBLE"
            )
        )

    # one JVM-side HALF_UP for BOTH physical forms (identity where the
    # broadcast branch already rounded) — rank on the rounded value so
    # tie-breaks agree between forms
    scored = scored.withColumn("prediction", F.round("prediction", 6))
    w = Window.partitionBy("user_id").orderBy(
        F.col("prediction").desc(), F.col("item_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= n
    )


def predict_svm_batch(
    query_features: DataFrame,
    model: DataFrame,
    threshold: float = 0.0,
    output_decision_function: bool = False,
    broadcast_model: bool = True,
) -> DataFrame:
    """M4 — score sparse query vectors against the flat SVM model.

    ``query_features`` is the exploded sparse form
    (query_id, feature_id, value). Semantics pinned to the reference
    (SVMPredict.java:71-90): features missing from the model contribute
    0 (left join + coalesce), decision = 1.0 if raw > threshold
    (strict >) else -1.0.

    The ranged layout (M5, RangePartitionSVMPredict.java) is a physical
    optimization of the same logical op — fewer RPCs per query. Under a
    join that collapsing is automatic, so one operator serves both; the
    ranged layout remains available as a storage option
    (ml/svm.py svm_model_ranged).
    """
    m = F.broadcast(model) if broadcast_model else model
    joined = query_features.join(m, "feature_id", "left")
    raw = joined.groupBy("query_id").agg(
        F.sum(
            F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("value")
        ).alias("raw_prediction"),
        F.count("*").alias("n_features"),
    )
    if output_decision_function:
        return raw.withColumn("prediction", F.col("raw_prediction"))
    return raw.withColumn(
        "prediction",
        F.when(F.col("raw_prediction") > F.lit(threshold), F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
