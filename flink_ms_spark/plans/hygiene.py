"""Pipeline-health audit queries (round-7 widening): the reports a
training-data pipeline runs BEFORE trusting its inputs — embedding
hygiene (non-finite / zero vectors, norm distribution, dead
dimensions), MinHash estimator calibration against exact Jaccard,
cross-source duplication structure, and per-source token-concentration
(Gini). These extend the curation families in ``northstar.py`` /
``pipeline.py`` / ``mixing.py`` with the audit layer on top of them.

Cross-engine determinism follows the repo-wide contracts: embedding
folds are sequential on both engines (list_sum vs F.aggregate — see
mixing.py's SQ8 note), token/shingle constructions reuse the pinned
``_DUCK_TOKS`` / ``_MINHASH_ORACLE`` builders, float aggregates round
to 6, and exact-integer arithmetic (Gini) uses DECIMAL(38,0) sums so
the formula is overflow-proof at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ms_spark.operators.dedup import (
    MINHASH_P,
    shingles,
)
from flink_ms_spark.operators.text import token_count
from flink_ms_spark.partitioning import FANOUT_KB_PER_TASK, fan_out
from flink_ms_spark.plans.northstar import _DUCK_TOKS, _MINHASH_ORACLE
from flink_ms_spark.plans.pipeline import _CC_CORE, _lsh_components
from flink_ms_spark.plans.registry import register
from flink_ms_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Embedding hygiene: the one-row corpus report an ANN/semantic-dedup
# stage should gate on — dimension consistency, non-finite values,
# zero vectors (cosine is undefined), and the L2-norm distribution.
# Scale: one scan, one global aggregate; the per-row fold is
# sequential on both engines so norms are bit-identical.

_EMBEDDING_HEALTH_ORACLE = """
WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
per AS (SELECT len(v) AS nd,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
          CASE WHEN len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0
               THEN 1 ELSE 0 END AS bad
        FROM e)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(nd) AS INT) AS dims_min,
  CAST(max(nd) AS INT) AS dims_max,
  CAST(sum(bad) AS BIGINT) AS n_nonfinite,
  CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
  CAST(round(avg(nrm), 6) AS DOUBLE) AS avg_norm,
  CAST(round(quantile_cont(nrm, 0.5), 6) AS DOUBLE) AS p50_norm
FROM per
"""


@register("embedding_health", oracle=_EMBEDDING_HEALTH_ORACLE)
def q_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-corpus hygiene report: vector count, dim
    min/max (a mismatch means a broken encoder batch), non-finite and
    zero-norm vector counts, and avg/median L2 norm."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    bad = F.exists(
        v,
        lambda x: F.isnan(x)
        | (x == F.lit(float("inf")))
        | (x == F.lit(float("-inf"))),
    )
    per = e.select(
        F.size("embedding").alias("nd"),
        F.sqrt(sq).alias("nrm"),
        bad.cast("int").alias("bad"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.min("nd").cast("int").alias("dims_min"),
        F.max("nd").cast("int").alias("dims_max"),
        F.sum("bad").cast("long").alias("n_nonfinite"),
        F.sum((F.col("nrm") == 0).cast("int")).cast("long").alias("n_zero_vectors"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(F.expr("percentile(nrm, 0.5)"), 6).alias("p50_norm"),
    )


# --------------------------------------------------------------------------
# Dead-dimension report: per-dimension min/max/variance. A dimension
# whose variance is ~0 carries no signal (a frozen encoder unit, or a
# padding column) — IVF/PQ codebooks waste capacity on it and distance
# contrast degrades. Scale: posexplode keyed on dimension index — the
# shuffle is |dims| keys wide, each group a columnar partial-agg, and
# the output is dim-scale (tiny) regardless of corpus size.

# The WHERE i.i <= len(e.v) filter matters on RAGGED corpora: DuckDB's
# generate_series goes to the GLOBAL max dim, and out-of-range v[i]
# yields NULL rows that count(*) would still count — Spark's posexplode
# emits only existing elements, so without the filter per-dim n
# diverges exactly when dims are inconsistent (the state this family
# exists to detect).
_DEAD_DIMS_ORACLE = """
WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
dimn AS (SELECT max(len(v)) AS nd FROM e),
flat AS (SELECT i.i AS dim, e.v[i.i] AS x
         FROM e, dimn, unnest(generate_series(1, dimn.nd)) AS i(i)
         WHERE i.i <= len(e.v))
SELECT CAST(dim AS INT) AS dim,
  CAST(count(*) AS BIGINT) AS n,
  CAST(min(x) AS DOUBLE) AS mn,
  CAST(max(x) AS DOUBLE) AS mx,
  CAST(round(var_pop(x), 6) AS DOUBLE) AS variance,
  CAST(CASE WHEN min(x) = max(x) THEN 1 ELSE 0 END AS INT) AS is_dead
FROM flat GROUP BY dim
"""


@register("dead_dims", oracle=_DEAD_DIMS_ORACLE)
def q_dead_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding stats (1-indexed): count, min, max,
    population variance, and a dead flag (min == max)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    flat = e.select(F.posexplode(v).alias("pos", "x")).select(
        (F.col("pos") + 1).cast("int").alias("dim"), "x"
    )
    return flat.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.round(F.var_pop("x"), 6).alias("variance"),
        (F.min("x") == F.max("x")).cast("int").alias("is_dead"),
    )


# --------------------------------------------------------------------------
# Cross-source duplication matrix: for every (source_a <= source_b)
# pair, the number of LSH near-dup components containing documents of
# BOTH sources. The off-diagonal cells are what a crawl triage reads:
# "mirror-site pair" vs "source duplicating only within itself"
# (diagonal). Scale: reuses the bipartite min-label components (no
# pairwise doc edges); the self-join runs on the (component, source)
# DISTINCT membership table, whose per-component group is at most
# |sources| rows — never a doc-scale quadratic.

_CROSS_SOURCE_ORACLE = _CC_CORE + """
, mem AS (SELECT DISTINCT c.component, d.source
          FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_components
FROM mem a JOIN mem b
  ON a.component = b.component AND a.source <= b.source
GROUP BY a.source, b.source
"""


@register("cross_source_dup_matrix", oracle=_CROSS_SOURCE_ORACLE)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup component co-occurrence matrix over source pairs
    (lexicographic source_a <= source_b; diagonal = components
    touching that source at all)."""
    cc = _lsh_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mem = (
        cc.join(docs, cc["node"] == docs["doc_id"])
        .select("component", "source")
        .distinct()
    )
    a = mem.select(F.col("component"), F.col("source").alias("source_a"))
    b = mem.select(F.col("component"), F.col("source").alias("source_b"))
    return (
        a.join(b, "component")
        .where(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_components"))
    )


# --------------------------------------------------------------------------
# MinHash estimator calibration: for every LSH candidate pair (3-gram
# signatures, any-band collision — the dup_clusters bucket space),
# compare the MinHash-estimated Jaccard (fraction of the k=4 hashes
# agreeing) against the EXACT Jaccard of the HASHED shingle sets —
# the very universe the estimator samples (x = md5-60bit mod p, the
# minhash pipeline's base hash; identical on both engines, so the
# comparison isolates estimator error, not hash error). Grouped by
# agreement level: the report that justifies (or indicts) a band
# configuration before a full dedup pass. Scale: the exact verify runs
# on the candidate set only (the lev_neardup discipline — quadratic
# work bounded by candidates, not the corpus); set sizes and per-doc
# distinct come from IN-ROW array_distinct (no corpus shuffle — the
# only exchanges are the banded signature join and the candidate-keyed
# intersection on 8-byte keys); hot buckets at web scale take the
# capped form (operators/dedup.py lsh_pair_stats).

_MINHASH_CALIBRATION_ORACLE = f"""
WITH sigs AS ({_MINHASH_ORACLE}),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM sigs x JOIN sigs y
           ON x.h = y.h AND x.minhash = y.minhash
         WHERE x.doc_id < y.doc_id),
ag AS (SELECT c.a, c.b,
         CAST(sum(CASE WHEN sx.minhash = sy.minhash THEN 1 ELSE 0 END)
              AS INT) AS n_agree
       FROM cand c
       JOIN sigs sx ON sx.doc_id = c.a
       JOIN sigs sy ON sy.doc_id = c.b AND sy.h = sx.h
       GROUP BY c.a, c.b),
toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
shx AS (SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS x
        FROM (SELECT doc_id, unnest(list_transform(
                generate_series(1, greatest(len(t) - 2, 1)),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
              FROM toks)),
sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY doc_id),
inter AS (SELECT c.a, c.b, count(*) AS ni
          FROM cand c
          JOIN shx x ON x.doc_id = c.a
          JOIN shx y ON y.doc_id = c.b AND y.x = x.x
          GROUP BY c.a, c.b),
jac AS (SELECT c.a, c.b,
          CAST(round(COALESCE(i.ni, 0) * 1.0
                     / (sa.n + sb.n - COALESCE(i.ni, 0)), 6) AS DOUBLE)
            AS jaccard
        FROM cand c
        LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
        JOIN sizes sa ON sa.doc_id = c.a
        JOIN sizes sb ON sb.doc_id = c.b)
SELECT g.n_agree,
  CAST(g.n_agree / CAST(4 AS DOUBLE) AS DOUBLE) AS est_jaccard,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(round(avg(j.jaccard), 6) AS DOUBLE) AS avg_jaccard,
  CAST(round(avg(abs(j.jaccard - g.n_agree / CAST(4 AS DOUBLE))), 6)
       AS DOUBLE) AS mae,
  CAST(min(j.jaccard) AS DOUBLE) AS min_jaccard,
  CAST(max(j.jaccard) AS DOUBLE) AS max_jaccard
FROM ag g JOIN jac j ON j.a = g.a AND j.b = g.b
GROUP BY g.n_agree
"""


def _shingle_hash_sets(docs: DataFrame):
    """(doc_id, x) exploded DISTINCT hashed-shingle rows, the in-row
    per-doc set sizes, AND the pinned base-hash table itself — x is
    the minhash pipeline's base hash (md5 60-bit mod p), de-duplicated
    with array_distinct BEFORE the explode so no corpus-wide shuffle
    is needed for distinctness. The base table is returned so callers
    can derive the minhash signatures from the SAME materialized md5
    pass (min over the distinct array equals min over the raw shingle
    stream) instead of paying a second corpus-wide md5 scan."""
    # The shingle→md5→60-bit pipeline runs in a mapInPandas hashlib
    # kernel (same kernel contract as operators/dedup.minhash_signatures,
    # r14: the interpreted JVM HOF lambdas cost ~10 s CPU at sf0.1 for
    # this one materialization; hashlib is ~40× cheaper per shingle and
    # the output is bit-identical — dict.fromkeys reproduces
    # array_distinct's first-occurrence order, NULL text keeps its
    # NULL-array row).
    import pandas as pd
    from pyspark.sql import types as T

    xs_schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema["doc_id"].dataType, False),
            T.StructField("_xs", T.ArrayType(T.LongType()), True),
        ]
    )

    def hash_sets(batches):
        import hashlib
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        md5 = hashlib.md5
        p = MINHASH_P
        for pdf in batches:
            ids_out, xs_out = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ids_out.append(doc_id)
                if text is None:
                    xs_out.append(None)
                    continue
                t = ws.split(text.strip(" "))
                n_pos = max(len(t) - 2, 1)
                xs_out.append(
                    list(
                        dict.fromkeys(
                            int(
                                md5(" ".join(t[i : i + 3]).encode("utf-8"))
                                .hexdigest()[:15],
                                16,
                            )
                            % p
                            for i in range(n_pos)
                        )
                    )
                )
            if not ids_out:
                # an empty object column arrives as float64 and
                # Arrow cannot cast that to list<...> — skip
                continue
            yield pd.DataFrame({"doc_id": ids_out, "_xs": xs_out})

    # materialize ONCE (consumers: the exploded set, the sizes, and
    # the signature derivation) — the community_modularity
    # localCheckpoint pattern; the pinned frame is doc-count rows
    # (hash arrays packed per row), not exploded-shingle rows.
    # kb_per_task: this is a byte-proportional md5 kernel — the same
    # family as minhash_signatures — and it was the one hot kernel
    # site left out of the r14 size-derived cap (r15: the uncapped
    # 32-task checkpoint wave measured 8.2 s summed runtime for 0.25 s
    # of CPU at sf0.1; the cap is a no-op at corpus scale).
    base = (
        fan_out(docs.select("doc_id", "text"), kb_per_task=FANOUT_KB_PER_TASK)
        .mapInPandas(hash_sets, schema=xs_schema)
        .localCheckpoint(eager=True)
    )
    sh = base.select("doc_id", F.explode("_xs").alias("x"))
    sizes = base.select("doc_id", F.size("_xs").alias("n"))
    return sh, sizes, base


@register("minhash_calibration", oracle=_MINHASH_CALIBRATION_ORACLE)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-vs-exact-Jaccard calibration per agreement level
    (n_agree of 4 hashes): pair count, mean/min/max exact Jaccard of
    the hashed shingle sets, and the estimator's mean absolute error."""
    docs = load_table(spark, sf_dir, "documents")
    sh, sizes, base = _shingle_hash_sets(docs)
    # The signatures are derived from the SAME pinned base-hash table
    # the exact-Jaccard side reads (r14: the query used to run the
    # corpus md5 pass twice — once in minhash_signatures, once in
    # _shingle_hash_sets — two ~10 s stages at sf0.1 for identical
    # md5(shingle) mod p values). min over the distinct array equals
    # min over the raw shingle stream, so the signature contract is
    # unchanged (same affine reseed as operators/dedup.py
    # minhash_signatures, pinned by the driver oracle). The derivation
    # is a cheap per-row array map over checkpointed blocks, so the
    # two band-join sides re-deriving it beats a third checkpoint.
    mins = F.transform(
        F.sequence(F.lit(1), F.lit(4)),
        lambda h: F.array_min(
            F.transform(
                F.col("_xs"),
                lambda x: ((F.lit(2) * h + 1) * x + h * F.lit(12_345) + 7)
                % MINHASH_P,
            )
        ),
    )
    sigs = base.select(
        "doc_id", F.posexplode(mins).alias("pos", "minhash")
    ).select("doc_id", (F.col("pos") + 1).cast("int").alias("h"), "minhash")
    sa = sigs.select(F.col("doc_id").alias("a"), "h", F.col("minhash").alias("mh"))
    sb = sigs.select(F.col("doc_id").alias("b"), "h", F.col("minhash").alias("mh"))
    # a band-join match AT h is precisely "hash h agrees", so the
    # agreement count falls out of the candidate aggregation itself —
    # no separate per-pair re-join against the signature table
    ag = (
        sa.join(sb, ["h", "mh"])  # explicit equi-join on the band key
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("int").alias("n_agree"))
        # candidate-pair rows (bounded by bucket sizes, 36k at sf0.1)
        # feed three branches: inter, and jac's complement + size joins
        .localCheckpoint(eager=True)
    )
    cand = ag.select("a", "b")
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "a"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "x"), ["b", "x"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = (
        cand.join(inter, ["a", "b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("n_b")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    est = F.col("n_agree") / F.lit(4.0)
    return (
        ag.join(jac, ["a", "b"])
        .groupBy("n_agree")
        .agg(
            F.round(F.avg(est), 6).cast("double").alias("est_jaccard"),
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
            F.round(F.avg(F.abs(F.col("jaccard") - est)), 6).alias("mae"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Token-concentration Gini per source: is a source's token mass spread
# evenly across documents or concentrated in a few giants? (Giants
# dominate a token-budget mix even after doc-level sampling — unimax /
# token_balanced_shards assume this report has been read.) The rank
# formula keeps everything in exact integer arithmetic until one final
# division: G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx), ranks ascending.
# Both the per-row product rk·x AND its sum run in DECIMAL (the
# money-sweep discipline): rk ~ docs-per-source times x ~ tokens-per-doc
# can exceed int64 at cluster scale, so the operands are cast BEFORE
# the multiply on both engines; the ratio is the
# only float, identical on both engines. Scale: per-source keyed
# window (the accepted stratified pattern, operators/mixing.py:335) +
# one per-source aggregate.

_TOKEN_GINI_ORACLE = f"""
WITH tok AS (SELECT doc_id, source,
        CAST(len({_DUCK_TOKS}) AS BIGINT) AS x
      FROM documents),
r AS (SELECT source, x,
        row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS rk
      FROM tok)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(x) AS BIGINT) AS total_tokens,
  CAST(round((2 * sum(CAST(rk AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
              - (count(*) + 1) * sum(x))
             / (CAST(count(*) AS DOUBLE) * sum(x)), 6) AS DOUBLE) AS gini
FROM r GROUP BY source
"""


@register("token_gini_by_source", oracle=_TOKEN_GINI_ORACLE)
def q_token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-document token counts within each
    source (0 = uniform, →1 = a few docs hold all tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", token_count("text").cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    r = tok.withColumn("rk", F.row_number().over(w))
    dec = "decimal(38,0)"
    # cast BEFORE multiplying (ADVICE r7): rk*x in int64 can overflow
    # in principle; decimal(19,0) operands give a (38,0) product
    t_sum = F.sum(F.col("rk").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
    s_sum = F.sum(F.col("x").cast(dec))
    n = F.count("*")
    gini = (
        (F.lit(2).cast(dec) * t_sum - (n + 1).cast(dec) * s_sum).cast("double")
        / (n.cast("double") * s_sum.cast("double"))
    )
    return r.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        s_sum.cast("long").alias("total_tokens"),
        F.round(gini, 6).alias("gini"),
    )
