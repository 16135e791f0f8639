"""Reference-parity oracle queries (SURVEY.md §2, oracle=yes rows).

Each query exercises the *package operator* on the Spark side and
declares equivalent ANSI SQL for DuckDB. Float outputs are rounded
identically on both sides wherever cross-engine summation order could
differ; pure per-row IEEE arithmetic (parse/format round-trips, factor
formulas) is left exact — it is bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark.functions.codecs import (
    bucket_of,
    format_model_row,
    normalize_query,
    parse_model_line,
)
from flink_ms_spark.functions.vector import dot, elementwise_mean, has_nan
from flink_ms_spark.ml.svm import svm_model_ranged
from flink_ms_spark.operators.evaluate import mse
from flink_ms_spark.operators.predict import predict_als_batch, predict_svm_batch
from flink_ms_spark.operators.sgd import sgd_step
from flink_ms_spark.plans.registry import register
from flink_ms_spark.plans.synthetic import (
    DUCK_SVM_MODEL_CTE,
    KIND_OFFSET,
    K,
    N_ITEMS,
    N_USERS,
    duck_factor,
    factors_array,
    synthetic_als_model,
    synthetic_svm_model,
)
from flink_ms_spark.sources.ratings import RATINGS_ORACLE_SQL, ratings_from_events
from flink_ms_spark.sources.tables import load_table
from flink_ms_spark.sources.text import parse_rating_lines

_RATINGS_CTE = f"ratings AS ({RATINGS_ORACLE_SQL})"
_JS_CTE = f"js AS (SELECT unnest(generate_series(1, {K})) AS j)"
_UF = duck_factor("user_id", "j", "U")
_IF = duck_factor("item_id", "j", "I")


# --------------------------------------------------------------------------
# T1/S1 — rating-line parse round-trip


@register(
    "parse_ratings",
    oracle=f"WITH {_RATINGS_CTE} SELECT user_id, item_id, rating FROM ratings",
)
def q_parse_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → tab-separated rating lines → T1 parse → typed rows.
    The string round-trip is exact (shortest-roundtrip double repr)."""
    ratings = ratings_from_events(spark, sf_dir)
    lines = ratings.select(
        F.concat_ws("\t", "user_id", "item_id", "rating").alias("value")
    )
    return parse_rating_lines(lines, sep="\t")


# --------------------------------------------------------------------------
# T2/T4/T5 — model codec round-trip (format → parse → key + factors)

_MODEL_CODEC_ORACLE = f"""
WITH {_JS_CTE},
model AS (
  SELECT CAST(u.id AS VARCHAR) AS id, 'U' AS kind, u.id AS iid
  FROM (SELECT unnest(generate_series(0, {N_USERS - 1})) AS id) u)
SELECT model.id || '-' || model.kind AS key, model.id, model.kind,
       CAST(js.j AS INT) AS pos,
       {duck_factor('model.iid', 'js.j', 'U')} AS value
FROM model CROSS JOIN js
"""


@register("model_codec", oracle=_MODEL_CODEC_ORACLE)
def q_model_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 format → T2/T4 parse round-trip over the synthetic user
    factors; emits composite state key + exploded factors. Exact values
    (no rounding): double→string→double round-trips bit-identically."""
    model = synthetic_als_model(spark).where(F.col("kind") == "U")
    lines = model.select(format_model_row("id", "kind", "factors").alias("value"))
    parsed = lines.select(*parse_model_line("value"))
    return parsed.select(
        "key",
        "id",
        "kind",
        F.posexplode("factors").alias("pos0", "value"),
    ).select("key", "id", "kind", (F.col("pos0") + 1).cast("int").alias("pos"), "value")


# --------------------------------------------------------------------------
# T6 — posexplode 1-indexed (SVM weight flatten shape)


@register(
    "posexplode_1idx",
    oracle=(
        "SELECT vec_id, CAST(t.j AS INT) AS feature_id, "
        "CAST(embedding[t.j] AS DOUBLE) AS weight "
        "FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS j) t"
    ),
)
def q_posexplode_1idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "w")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("feature_id"),
        F.col("w").cast("double").alias("weight"),
    )


# --------------------------------------------------------------------------
# T8/P3 — range-partition bucketing


@register(
    "bucket",
    oracle="SELECT p_partkey, CAST(p_partkey // 1000 AS INT) AS bucket FROM part",
)
def q_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", bucket_of("p_partkey", 1000).alias("bucket"))


# --------------------------------------------------------------------------
# T9 — query normalization


@register(
    "upper_trim",
    oracle="SELECT event_id, upper(trim(event_type)) AS q FROM events",
)
def q_upper_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("event_id", normalize_query("event_type").alias("q"))


# --------------------------------------------------------------------------
# A1/M10 — elementwise mean vector


@register(
    "mean_vector",
    oracle=(
        "SELECT CAST(t.j AS INT) AS pos, "
        "CAST(round(avg(CAST(embedding[t.j] AS DOUBLE)), 6) AS DOUBLE) AS mean_value "
        "FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS j) t "
        "GROUP BY t.j"
    ),
)
def q_mean_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("factors")
    )
    mean = elementwise_mean(emb)  # 1 row, ARRAY<DOUBLE>
    return mean.select(F.posexplode("factors").alias("pos0", "m")).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("m", 6).alias("mean_value"),
    )


# --------------------------------------------------------------------------
# A2 — ranged model concat (sorted-by-id defined order)

_RANGE_CONCAT_ORACLE = f"""
WITH svm_full AS (
  SELECT CAST(f.id AS INT) AS feature_id,
         {duck_factor('f.id', '1', 'W')} AS weight
  FROM (SELECT unnest(generate_series(1, 64)) AS id) f)
SELECT CAST(feature_id // 16 AS INT) AS bucket,
       string_agg(printf('%d:%.6f', feature_id, weight), ';' ORDER BY feature_id) AS entries
FROM svm_full GROUP BY 1
"""


@register("range_concat", oracle=_RANGE_CONCAT_ORACLE)
def q_range_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 via the package's ranged-layout builder, re-serialized to the
    reference text form ``bucket,id:w;id:w;...`` with %.6f weights."""
    flat = synthetic_svm_model(spark, odd_only=False)
    ranged = svm_model_ranged(flat, range_size=16)  # (bucket, entries MAP)
    return ranged.select(
        "bucket",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("entries")),
                lambda e: F.format_string("%d:%.6f", e.getField("key"), e.getField("value")),
            ),
            ";",
        ).alias("entries"),
    )


# --------------------------------------------------------------------------
# A5 — union all


@register(
    "union_all",
    oracle=(
        "SELECT c_custkey AS id, 'C' AS kind FROM customer "
        "UNION ALL SELECT s_suppkey AS id, 'S' AS kind FROM supplier"
    ),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("C").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("S").alias("kind")
    )
    return c.unionAll(s)


# --------------------------------------------------------------------------
# M3 — ALS dot-product predict (join-based batch form)

_ALS_DOT_ORACLE = f"""
WITH {_RATINGS_CTE},
pairs AS (SELECT DISTINCT user_id, item_id FROM ratings WHERE user_id < {N_USERS})
SELECT user_id, item_id,
  CAST(round(list_sum(list_transform(generate_series(1, {K}),
    j -> ({_UF}) * ({_IF}))), 6) AS DOUBLE) AS prediction
FROM pairs
"""


@register("als_dot", oracle=_ALS_DOT_ORACLE)
def q_als_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = synthetic_als_model(spark)
    pairs = (
        ratings_from_events(spark, sf_dir)
        .where(F.col("user_id") < N_USERS)
        .select("user_id", "item_id")
        .distinct()
    )
    scored = predict_als_batch(pairs, model)
    return scored.select(
        F.col("user_id").cast("int").alias("user_id"),
        F.col("item_id").cast("int").alias("item_id"),
        F.round("prediction", 6).alias("prediction"),
    )


# --------------------------------------------------------------------------
# M4 — SVM sparse predict (missing feature → 0, strict > threshold)

_SVM_PREDICT_ORACLE = f"""
WITH {DUCK_SVM_MODEL_CTE},
qf AS (
  SELECT vec_id AS query_id, CAST(t.j AS INT) AS feature_id,
         CAST(embedding[t.j] AS DOUBLE) AS value
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS j) t),
raw AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS n_features,
         CAST(round(sum(COALESCE(m.weight, 0.0) * qf.value), 6) AS DOUBLE) AS raw_prediction
  FROM qf LEFT JOIN svm_model m USING (feature_id)
  GROUP BY query_id)
SELECT query_id, n_features, raw_prediction,
       CAST(CASE WHEN raw_prediction > 0.0 THEN 1.0 ELSE -1.0 END AS DOUBLE) AS prediction
FROM raw
"""


def _embedding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("query_id"), F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "query_id",
        (F.col("pos0") + 1).cast("int").alias("feature_id"),
        F.col("v").cast("double").alias("value"),
    )


def _svm_predict_frame(qf: DataFrame, model: DataFrame) -> DataFrame:
    raw = predict_svm_batch(qf, model, output_decision_function=True)
    # threshold applied to the ROUNDED raw so both engines agree at the
    # decision boundary
    return raw.select(
        "query_id",
        "n_features",
        F.round("raw_prediction", 6).alias("raw_prediction"),
    ).withColumn(
        "prediction",
        F.when(F.col("raw_prediction") > 0.0, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )


@register("svm_predict", oracle=_SVM_PREDICT_ORACLE)
def q_svm_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _svm_predict_frame(
        _embedding_features(spark, sf_dir), synthetic_svm_model(spark, odd_only=True)
    )


@register("svm_predict_ranged", oracle=_SVM_PREDICT_ORACLE)
def q_svm_predict_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 ≡ M4 equivalence: the same predictions through the
    range-partitioned layout (build buckets, explode back, join)."""
    flat = synthetic_svm_model(spark, odd_only=True)
    ranged = svm_model_ranged(flat, range_size=16)
    back_flat = ranged.select(
        F.explode("entries").alias("feature_id", "weight")
    )
    return _svm_predict_frame(_embedding_features(spark, sf_dir), back_flat)


# --------------------------------------------------------------------------
# A3/A4/M8 — MSE with inner-join skip semantics

_MSE_ORACLE = f"""
WITH {_RATINGS_CTE},
scored AS (
  SELECT rating,
    list_sum(list_transform(generate_series(1, {K}), j -> ({_UF}) * ({_IF}))) AS p
  FROM ratings WHERE user_id < {N_USERS})
SELECT CAST(round(avg((rating - p) * (rating - p)), 6) AS DOUBLE) AS mse,
       CAST(count(*) AS BIGINT) AS n
FROM scored
"""


@register("mse", oracle=_MSE_ORACLE)
def q_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users ≥ N_USERS are absent from the model → skipped (inner
    join), so the denominator counts only scored pairs (M8)."""
    ratings = ratings_from_events(spark, sf_dir)
    out = mse(ratings, synthetic_als_model(spark))
    return out.select(F.round("mse", 6).alias("mse"), "n")


# --------------------------------------------------------------------------
# M6/M7/T7 — one SGD micro-batch (simultaneous update, exploded rows)

_SGD_ORACLE = f"""
WITH r2 AS (
  -- ord must be the raw event_id, which the shared ratings CTE does
  -- not carry, so the clamp/mod derivation is inlined here (keep in
  -- sync with sources/ratings.py RATINGS_ORACLE_SQL)
  SELECT event_id AS ord, CAST(user_id AS INT) AS user_id,
         CAST(event_id % 200 AS INT) AS item_id,
         LEAST(GREATEST(value, 0.0), 5.0) AS rating
  FROM events WHERE CAST(user_id AS INT) < {N_USERS}),
upd AS (
  SELECT ord, user_id, item_id, rating,
    rating - list_sum(list_transform(generate_series(1, {K}),
      j -> ({_UF}) * ({_IF}))) AS e
  FROM r2),
rows_out AS (
  SELECT ord, CAST(user_id AS VARCHAR) AS id, 'U' AS kind, js.j AS pos,
         ({_UF.replace('j', 'js.j')}) + 0.1 * (e * ({_IF.replace('j', 'js.j')})
           - 0.0 * ({_UF.replace('j', 'js.j')})) AS val
  FROM upd CROSS JOIN (SELECT unnest(generate_series(1, {K})) AS j) js
  UNION ALL
  SELECT ord, CAST(item_id AS VARCHAR) AS id, 'I' AS kind, js.j AS pos,
         ({_IF.replace('j', 'js.j')}) + 0.1 * (e * ({_UF.replace('j', 'js.j')})
           - 0.0 * ({_IF.replace('j', 'js.j')})) AS val
  FROM upd CROSS JOIN (SELECT unnest(generate_series(1, {K})) AS j) js),
latest AS (
  SELECT id, kind, pos, val,
         row_number() OVER (PARTITION BY id, kind, pos ORDER BY ord DESC) AS rn
  FROM rows_out)
SELECT id, kind, CAST(pos AS INT) AS pos,
       CAST(round(val, 6) AS DOUBLE) AS value
FROM latest WHERE rn = 1
"""


@register("sgd_step", oracle=_SGD_ORACLE)
def q_sgd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ratings = events.select(
        F.col("user_id").cast("int").alias("user_id"),
        (F.col("event_id") % 200).cast("int").alias("item_id"),
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(5.0)).alias("rating"),
        F.col("event_id").alias("ord"),
    ).where(F.col("user_id") < N_USERS)
    updated = sgd_step(
        ratings, synthetic_als_model(spark), learning_rate=0.1, ordinal_col="ord"
    )
    return updated.select(
        "id", "kind", F.posexplode("factors").alias("pos0", "v")
    ).select(
        "id",
        "kind",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("v", 6).alias("value"),
    )


# --------------------------------------------------------------------------
# M9 — NaN guard

_NAN_ORACLE = f"""
SELECT CAST(u.id AS BIGINT) AS id
FROM (SELECT unnest(generate_series(0, 149)) AS id) u
WHERE len(list_filter(generate_series(1, {K}), j -> (u.id + j) % 13 = 0)) = 0
"""


@register("nan_guard", oracle=_NAN_ORACLE)
def q_nan_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject NaN into factor j of id where (id+j)%13==0; keep only
    rows with no NaN (SGDV0 drop behavior via has_nan)."""
    df = spark.range(0, 150).select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.lit(K)),
            lambda j: F.when((F.col("id") + j) % 13 == 0, F.lit(float("nan"))).otherwise(
                ((F.col("id") * 31 + j * 17) % 97) / 97.0 - 0.5
            ),
        ).alias("factors"),
    )
    return df.where(~has_nan("factors")).select("id")


# --------------------------------------------------------------------------
# M7 — cold-start mean fallback

_COLDSTART_ORACLE = f"""
WITH {_RATINGS_CTE},
mean_u AS (
  SELECT j, avg({duck_factor('u.id', 'j', 'U')}) AS m
  FROM (SELECT unnest(generate_series(0, {N_USERS - 1})) AS id) u
  CROSS JOIN (SELECT unnest(generate_series(1, {K})) AS j) js(j)
  GROUP BY j),
pairs AS (SELECT DISTINCT user_id, item_id FROM ratings WHERE user_id >= {N_USERS})
SELECT p.user_id, p.item_id,
  CAST(round(sum(mu.m * ({duck_factor('p.item_id', 'mu.j', 'I')})), 6) AS DOUBLE)
    AS prediction
FROM pairs p CROSS JOIN mean_u mu
GROUP BY p.user_id, p.item_id
"""


@register("coldstart", oracle=_COLDSTART_ORACLE)
def q_coldstart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users ≥ N_USERS miss the model → score with the elementwise-mean
    user vector (MEAN-U semantics) against real item factors."""
    model = synthetic_als_model(spark)
    mean_u = elementwise_mean(model.where(F.col("kind") == "U")).select(
        F.col("factors").alias("mean_u")
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").cast("int").alias("item_id"), F.col("factors").alias("i_factors")
    )
    pairs = (
        ratings_from_events(spark, sf_dir)
        .where(F.col("user_id") >= N_USERS)
        .select("user_id", "item_id")
        .distinct()
    )
    return (
        pairs.crossJoin(F.broadcast(mean_u))
        .join(F.broadcast(items), "item_id")
        .select(
            "user_id",
            "item_id",
            F.round(dot("mean_u", "i_factors"), 6).alias("prediction"),
        )
    )


# --------------------------------------------------------------------------
# K4/X1 — queryable-state upsert semantics as a pure batch op:
# latest payload per key (last-write-wins by arrival ordinal)

_SERVING_UPSERT_ORACLE = """
WITH r AS (SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
           FROM events)
SELECT CAST(user_id AS VARCHAR) AS key, event_type, value
FROM r WHERE rn = 1
"""


@register("serving_upsert", oracle=_SERVING_UPSERT_ORACLE)
def q_serving_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K4 queryable-state sink's upsert, batch form: string-keyed
    latest-per-key over the events stream, ordered by source offset
    (event_id) — the same last-write-wins contract the streaming
    loader applies per micro-batch (streaming/loader.py).

    Scale: single shuffle on key with a max-struct aggregate (partial
    agg map-side) — no window sort of the whole stream.
    """
    from flink_ms_spark.serving.store import latest_per_key

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("_ord"),
        "event_type",
        "value",
    )
    return latest_per_key(ev)


# --------------------------------------------------------------------------
# top-N recommendations per user — recommendForAllUsers-shape serving
# query over the synthetic model (users × items scored, window top-3)

_ALS_TOPN_ORACLE = f"""
WITH users AS (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS user_id),
items AS (SELECT CAST(unnest(generate_series(0, {N_ITEMS - 1})) AS INT) AS item_id),
scored AS (
  SELECT u.user_id, i.item_id,
    CAST(round(list_sum(list_transform(generate_series(1, {K}),
      j -> ({duck_factor("u.user_id", "j", "U")})
           * ({duck_factor("i.item_id", "j", "I")}))), 6) AS DOUBLE)
      AS prediction
  FROM users u CROSS JOIN items i),
rk AS (SELECT user_id, item_id, prediction,
         CAST(row_number() OVER (PARTITION BY user_id
              ORDER BY prediction DESC, item_id) AS INT) AS rk
       FROM scored)
SELECT user_id, item_id, prediction, rk FROM rk WHERE rk <= 3
"""


@register("als_topn_recs", oracle=_ALS_TOPN_ORACLE)
def q_als_topn_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 item recommendations for the first 20 users — the
    recommendForAllUsers serving shape via
    ``operators.predict.recommend_topn``: broadcast form here (the
    fixture model ≪ broadcast range); the SAME operator's
    ``blocked=True`` path is the model-scale block×block matmul, pinned
    result-equal and cartesian-free in tests/test_predict_blocked.py.
    """
    from flink_ms_spark.operators.predict import recommend_topn

    model = synthetic_als_model(spark)
    users = model.where((F.col("kind") == "U") & (F.col("id").cast("int") < 20)).select(
        F.col("id").cast("int").alias("user_id"), "factors"
    )
    items = model.where(F.col("kind") == "I").select(
        F.col("id").cast("int").alias("item_id"), "factors"
    )
    return recommend_topn(users, items, n=3)


# --------------------------------------------------------------------------
# Ranking evaluation of the served recommendations — the ranking
# complement of M8's MSE: micro-averaged precision/recall@3 of the
# top-3 recs against relevant (rating ≥ 4) held-out items. Micro
# averages are EXACT integer ratios (total hits / slot count), so the
# cross-engine comparison never rides float mean order.

_RANKING_EVAL_ORACLE = f"""
WITH {_RATINGS_CTE},
users AS (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS user_id),
items AS (SELECT CAST(unnest(generate_series(0, {N_ITEMS - 1})) AS INT) AS item_id),
scored AS (
  SELECT u.user_id, i.item_id,
    CAST(round(list_sum(list_transform(generate_series(1, {K}),
      j -> ({duck_factor("u.user_id", "j", "U")})
           * ({duck_factor("i.item_id", "j", "I")}))), 6) AS DOUBLE)
      AS prediction
  FROM users u CROSS JOIN items i),
rk AS (SELECT user_id, item_id,
         row_number() OVER (PARTITION BY user_id
              ORDER BY prediction DESC, item_id) AS rk
       FROM scored),
recs AS (SELECT user_id, item_id FROM rk WHERE rk <= 3),
rel AS (SELECT DISTINCT user_id, item_id FROM ratings
        WHERE rating >= 4.0 AND user_id < 20),
hits AS (SELECT recs.user_id, count(rel.item_id) AS n_hits
         FROM recs LEFT JOIN rel USING (user_id, item_id)
         GROUP BY recs.user_id),
relc AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY user_id),
per AS (SELECT relc.user_id, coalesce(h.n_hits, 0) AS n_hits, relc.n_rel
        FROM relc LEFT JOIN hits h USING (user_id))
SELECT CAST(3 AS INT) AS k, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       CAST(round(sum(n_hits) * 1.0 / (3 * count(*)), 6) AS DOUBLE)
         AS precision_at_k,
       CAST(round(sum(n_hits) * 1.0 / sum(n_rel), 6) AS DOUBLE)
         AS recall_at_k
FROM per
"""


@register("recs_ranking_eval", oracle=_RANKING_EVAL_ORACLE)
def q_recs_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-averaged precision/recall@3 of the served top-3 recs vs
    rating ≥ 4 relevance — one row, exact integer ratios."""
    recs = q_als_topn_recs(spark, sf_dir).select("user_id", "item_id")
    ratings = ratings_from_events(spark, sf_dir)
    rel = (
        ratings.where((F.col("rating") >= 4.0) & (F.col("user_id") < 20))
        .select("user_id", "item_id")
        .distinct()
    )
    hits = (
        recs.join(rel.withColumn("_hit", F.lit(1)), ["user_id", "item_id"], "left")
        .groupBy("user_id")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"))
    )
    relc = rel.groupBy("user_id").agg(F.count("*").alias("n_rel"))
    per = relc.join(hits, "user_id", "left").na.fill({"n_hits": 0})
    return per.agg(
        F.lit(3).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.round(F.sum("n_hits") / (F.lit(3) * F.count("*")), 6).alias(
            "precision_at_k"
        ),
        F.round(F.sum("n_hits") / F.sum("n_rel"), 6).alias("recall_at_k"),
    )


# --------------------------------------------------------------------------
# M6 variant — SGDV0's sequential update (item sees post-update user)

_SGD_SEQ_ORACLE = f"""
WITH r2 AS (
  -- ord must be the raw event_id, which the shared ratings CTE does
  -- not carry, so the clamp/mod derivation is inlined here (keep in
  -- sync with sources/ratings.py RATINGS_ORACLE_SQL)
  SELECT event_id AS ord, CAST(user_id AS INT) AS user_id,
         CAST(event_id % 200 AS INT) AS item_id,
         LEAST(GREATEST(value, 0.0), 5.0) AS rating
  FROM events WHERE CAST(user_id AS INT) < {N_USERS}),
upd AS (
  SELECT ord, user_id, item_id, rating,
    rating - list_sum(list_transform(generate_series(1, {K}),
      j -> ({_UF}) * ({_IF}))) AS e
  FROM r2),
rows_out AS (
  SELECT ord, CAST(user_id AS VARCHAR) AS id, 'U' AS kind, js.j AS pos,
         ({_UF.replace('j', 'js.j')}) + 0.1 * e * ({_IF.replace('j', 'js.j')}) AS val
  FROM upd CROSS JOIN (SELECT unnest(generate_series(1, {K})) AS j) js
  UNION ALL
  SELECT ord, CAST(item_id AS VARCHAR) AS id, 'I' AS kind, js.j AS pos,
         ({_IF.replace('j', 'js.j')})
           + 0.1 * e * (({_UF.replace('j', 'js.j')})
                        + 0.1 * e * ({_IF.replace('j', 'js.j')})) AS val
  FROM upd CROSS JOIN (SELECT unnest(generate_series(1, {K})) AS j) js),
latest AS (
  SELECT id, kind, pos, val,
         row_number() OVER (PARTITION BY id, kind, pos ORDER BY ord DESC) AS rn
  FROM rows_out)
SELECT id, kind, CAST(pos AS INT) AS pos,
       CAST(round(val, 6) AS DOUBLE) AS value
FROM latest WHERE rn = 1
"""


@register("sgd_step_sequential", oracle=_SGD_SEQ_ORACLE)
def q_sgd_step_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SGDV0's semantic fork (SGDV0.java:188-197): the item update reads
    the post-update user vector — i' = i + η·e·(u + η·e·i) at λ=0."""
    events = load_table(spark, sf_dir, "events")
    ratings = events.select(
        F.col("user_id").cast("int").alias("user_id"),
        (F.col("event_id") % 200).cast("int").alias("item_id"),
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(5.0)).alias("rating"),
        F.col("event_id").alias("ord"),
    ).where(F.col("user_id") < N_USERS)
    updated = sgd_step(
        ratings,
        synthetic_als_model(spark),
        learning_rate=0.1,
        ordinal_col="ord",
        sequential=True,
    )
    return updated.select(
        "id", "kind", F.posexplode("factors").alias("pos0", "v")
    ).select(
        "id",
        "kind",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("v", 6).alias("value"),
    )

# --------------------------------------------------------------------------
# NDCG@3 — the graded-ranking complement of precision/recall@3: hits
# earn position-discounted credit 1/log2(rk+1), normalized by the
# ideal DCG for the user's relevant-set size. Per-user ndcg is pinned
# to 6 dp before the macro mean (3-term sums — cross-engine float
# order is a non-issue at that precision).

_NDCG_ORACLE = f"""
WITH {_RATINGS_CTE},
users AS (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS user_id),
items AS (SELECT CAST(unnest(generate_series(0, {N_ITEMS - 1})) AS INT) AS item_id),
scored AS (
  SELECT u.user_id, i.item_id,
    CAST(round(list_sum(list_transform(generate_series(1, {K}),
      j -> ({duck_factor("u.user_id", "j", "U")})
           * ({duck_factor("i.item_id", "j", "I")}))), 6) AS DOUBLE)
      AS prediction
  FROM users u CROSS JOIN items i),
rk AS (SELECT user_id, item_id,
         row_number() OVER (PARTITION BY user_id
              ORDER BY prediction DESC, item_id) AS rk
       FROM scored),
recs AS (SELECT user_id, item_id, rk FROM rk WHERE rk <= 3),
rel AS (SELECT DISTINCT user_id, item_id FROM ratings
        WHERE rating >= 4.0 AND user_id < 20),
dcg AS (SELECT recs.user_id,
          sum(CASE WHEN rel.item_id IS NOT NULL
                   THEN 1.0 / log2(recs.rk + 1) ELSE 0 END) AS dcg
        FROM recs LEFT JOIN rel USING (user_id, item_id)
        GROUP BY recs.user_id),
relc AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY user_id),
per AS (SELECT relc.user_id,
          round(coalesce(d.dcg, 0)
                / (1.0 / log2(2.0)
                   + CASE WHEN n_rel >= 2 THEN 1.0 / log2(3.0) ELSE 0 END
                   + CASE WHEN n_rel >= 3 THEN 1.0 / log2(4.0) ELSE 0 END),
                6) AS ndcg
        FROM relc LEFT JOIN dcg d USING (user_id))
SELECT CAST(3 AS INT) AS k, CAST(count(*) AS BIGINT) AS n_users,
       CAST(round(avg(ndcg), 6) AS DOUBLE) AS mean_ndcg
FROM per
"""


@register("recs_ndcg", oracle=_NDCG_ORACLE)
def q_recs_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro-averaged NDCG@3 of the served top-3 recs against
    rating >= 4 relevance (users with at least one relevant item)."""
    recs = q_als_topn_recs(spark, sf_dir).select("user_id", "item_id", "rk")
    ratings = ratings_from_events(spark, sf_dir)
    rel = (
        ratings.where((F.col("rating") >= 4.0) & (F.col("user_id") < 20))
        .select("user_id", "item_id")
        .distinct()
    )
    dcg = (
        recs.join(rel.withColumn("_hit", F.lit(1)), ["user_id", "item_id"], "left")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("_hit").isNotNull(), 1.0 / F.log2(F.col("rk") + 1))
                .otherwise(F.lit(0.0))
            ).alias("dcg")
        )
    )
    relc = rel.groupBy("user_id").agg(F.count("*").alias("n_rel"))
    idcg = (
        F.lit(1.0) / F.log2(F.lit(2.0))
        + F.when(F.col("n_rel") >= 2, 1.0 / F.log2(F.lit(3.0))).otherwise(0.0)
        + F.when(F.col("n_rel") >= 3, 1.0 / F.log2(F.lit(4.0))).otherwise(0.0)
    )
    per = relc.join(dcg, "user_id", "left").select(
        "user_id",
        F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6).alias("ndcg"),
    )
    return per.agg(
        F.lit(3).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
    )
