"""Similarity search over embedding columns (ARRAY<FLOAT/DOUBLE>).

Two tiers:

- **brute-force cosine top-k** — the exactness baseline. All-pairs
  join; at scale this is O(n²) and only correct for a bounded query
  set vs a large corpus (broadcast the queries, stream the corpus).
- **IVF (inverted-file) top-k** — the scale path: a cheap deterministic
  coarse quantizer assigns each vector to a cell; search only joins
  query cells to corpus cells (equi-join on cell id → shuffle prunes
  the candidate space by the cell count). Recall/cost is tuned by
  ``n_probe``-style cell expansion (here: exact cell match, the
  oracle-checkable core).

Determinism rules (oracle parity): similarities are rounded to 6
decimals *before* ranking, ties broken by neighbor id — so Spark and
DuckDB produce identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_ms_spark.functions.vector import cosine, dot


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Brute-force cosine top-k neighbors: (a, b, cos_sim, rk).

    ``queries`` defaults to ``df`` (all-pairs self-search, minus self).
    With an explicit small query set, the query side is broadcast so the
    corpus never shuffles.
    """
    corpus = df.select(F.col(id_col).alias("b"), _as_double(vec_col).alias("vb"))
    qs = (queries or df).select(F.col(id_col).alias("a"), _as_double(vec_col).alias("va"))
    if queries is not None:
        qs = F.broadcast(qs)
    pairs = qs.crossJoin(corpus).where(F.col("a") != F.col("b"))
    scored = pairs.select(
        "a", "b", F.round(cosine("va", "vb"), 6).alias("cos_sim")
    )
    w = Window.partitionBy("a").orderBy(F.col("cos_sim").desc(), F.col("b").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def ivf_cell(vec_col: Column | str, n_dims: int = 3) -> Column:
    """Deterministic coarse quantizer: sign bits of the first
    ``n_dims`` components → cell id string like '101'. A trained
    k-means codebook drops in behind the same cell-id contract."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_dims)
        ],
    )


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_dims: int = 3,
) -> DataFrame:
    """IVF top-k: exact cosine ranking *within* the coarse cell.

    The join key is the cell id, so candidate generation is an
    equi-join (shuffle by cell), never an all-pairs cross. With 2^d
    cells the pair count drops ~2^d-fold at equal data; skewed cells
    are split by AQE.
    """
    with_cell = df.select(
        F.col(id_col), _as_double(vec_col).alias("v"), ivf_cell(vec_col, cell_dims).alias("cell")
    )
    a = with_cell.select(F.col(id_col).alias("a"), F.col("v").alias("va"), "cell")
    b = with_cell.select(F.col(id_col).alias("b"), F.col("v").alias("vb"), "cell")
    pairs = a.join(b, "cell").where(F.col("a") != F.col("b"))
    scored = pairs.select("a", "b", F.round(cosine("va", "vb"), 6).alias("cos_sim"))
    w = Window.partitionBy("a").orderBy(F.col("cos_sim").desc(), F.col("b").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
