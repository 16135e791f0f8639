"""Round-2 corpus-curation queries: exact substring dedup (removal,
not just detection), a conditional char-trigram LM quality score,
hybrid lexical+vector retrieval fusion, and token-balanced output
sharding.

Same contract as every other plans module: the Spark side goes through
package operators / pure Column expressions, and the DuckDB oracle
spells identical semantics so the driver's hash gate covers the op.
All hashing is md5-based and all float outputs are rounded to 6 dp on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_ms_spark.operators.dedup import exact_substring_dedup
from flink_ms_spark.operators.text import char_trigram_lm_score
from flink_ms_spark.plans.registry import register, values_clause
from flink_ms_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Exact substring dedup — the REMOVAL step of Lee et al. 2022
# ("Deduplicating Training Data Makes Language Models Better"):
# every 10-token span that occurs more than once in the corpus keeps
# only its first occurrence (global order = (doc_id, position)); all
# later occurrences are cut from their documents and the cleaned text
# is reassembled. `duplicated_ngrams` is the detection half of this;
# this query is the half that actually edits the corpus.
#
# Scale: span construction is a narrow map; the one heavy shuffle is
# row_number over gram groups (key space ~ corpus size, well spread;
# boilerplate grams are the hot keys — AQE skew splitting applies, and
# a bucket-size cap like lsh_candidate_pairs' would drop
# template-grams into exact-dedup instead). Reassembly shuffles by
# doc_id only.

_SUBSTR_DEDUP_ORACLE = """
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents),
spanidx AS (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 9)) AS idx
            FROM toks WHERE len(t) >= 10),
spans AS (SELECT doc_id, idx, array_to_string(t[idx:idx+9], ' ') AS gram
          FROM spanidx),
ranked AS (SELECT doc_id, idx,
                  row_number() OVER (PARTITION BY gram ORDER BY doc_id, idx) AS rn
           FROM spans),
coveredx AS (SELECT doc_id, unnest(generate_series(idx, idx + 9)) AS pos
             FROM ranked WHERE rn > 1),
covered AS (SELECT DISTINCT doc_id, pos FROM coveredx),
tokposx AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM toks),
tokpos AS (SELECT doc_id, pos, t[pos] AS tok FROM tokposx),
kept AS (SELECT k.doc_id, k.pos, k.tok
         FROM tokpos k LEFT JOIN covered c
           ON k.doc_id = c.doc_id AND k.pos = c.pos
         WHERE c.doc_id IS NULL),
cleaned AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.t) AS INT) AS n_tokens,
       CAST(len(t.t) - coalesce(c.n_kept, 0) AS INT) AS n_removed,
       coalesce(c.clean_text, '') AS clean_text
FROM toks t LEFT JOIN cleaned c USING (doc_id)
"""


@register("substring_dedup", oracle=_SUBSTR_DEDUP_ORACLE)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut all-but-first occurrences of every duplicated 10-token span
    and return the cleaned corpus with removal counts."""
    return exact_substring_dedup(load_table(spark, sf_dir, "documents"), n=10)


# --------------------------------------------------------------------------
# Conditional char-trigram LM (CCNet-flavored, Wenzek et al. 2020):
# fit P(c3 | c1 c2) = count(c1c2c3) / count(c1c2·) on the corpus, then
# score each doc by its mean -log2 P over trigrams (≈ bits/char under
# the model). Complements `lm_score` (unigram, word-level): the
# conditional char model catches garbled byte soup and wrong-script
# text that word unigrams miss. The model is alphabet³-bounded (tiny),
# so both model joins broadcast; the corpus sees two narrow maps and
# two map-side-combined aggregations.

_TRIGRAM_LM_ORACLE = """
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
           FROM documents),
trix AS (SELECT doc_id,
                unnest(list_transform(
                  generate_series(1, greatest(length(s) - 2, 1)),
                  i -> substr(s, i, 3))) AS tri
         FROM d),
pdt AS (SELECT doc_id, tri, count(*) AS n FROM trix GROUP BY doc_id, tri),
m AS (SELECT tri, sum(n) AS c FROM pdt GROUP BY tri),
ctx AS (SELECT substr(tri, 1, 2) AS cx, CAST(sum(c) AS DOUBLE) AS cc
        FROM m GROUP BY 1),
p AS (SELECT m.tri,
        CAST(round(-log2(CAST(m.c AS DOUBLE) / ctx.cc) * 1000000.0, 0)
          AS BIGINT) AS bits6
      FROM m JOIN ctx ON substr(m.tri, 1, 2) = ctx.cx)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_trigrams,
       round(sum(n * bits6) / sum(n) / 1000000.0, 6) AS avg_bits
FROM pdt JOIN p USING (tri) GROUP BY doc_id
"""


@register("char_trigram_lm", oracle=_TRIGRAM_LM_ORACLE)
def q_char_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean -log2 P(c3|c1c2) under a corpus char-trigram LM."""
    return char_trigram_lm_score(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Hybrid retrieval — reciprocal-rank fusion (Cormack et al. 2009) of
# the BM25 lexical top-20 (same fixed query terms as `bm25_search`)
# and the embedding-cosine top-20 against a fixed query vector
# (vec_id 0; vec_id aligns with doc_id in the fixture). RRF score =
# Σ 1/(60 + rank) over the rankers that retrieved the doc. Ranks are
# assigned on the 6dp-rounded scores with doc-id tie-break on BOTH
# engines, so the fusion is bit-deterministic. Scale: both rankers end
# in a global top-k (partial TakeOrdered per partition); the fusion
# itself is a 40-row outer join.

_RRF_K = 60


# Deferred oracle builder: importing plans.pipeline at module level
# would reorder the catalog's non-priority tail (pipeline registers
# before curation), so BM25_SCORED_CTES is resolved lazily — matching
# q_rrf_fusion's lazy q_bm25_search import.
def _rrf_oracle() -> str:
    from flink_ms_spark.plans.pipeline import BM25_SCORED_CTES

    return f"""
WITH {BM25_SCORED_CTES},
bm AS (SELECT doc_id,
              CAST(row_number() OVER (
                ORDER BY round(score, 6) DESC, doc_id) AS INT) AS bm25_rk
       FROM bm25_scored ORDER BY round(score, 6) DESC, doc_id LIMIT 20),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
norms AS (SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
qv AS (SELECT v, nrm FROM norms WHERE vec_id = 0),
cos_scored AS (SELECT n.vec_id AS doc_id,
                      round(list_dot_product(n.v, qv.v) / (n.nrm * qv.nrm), 6) AS cs
               FROM norms n CROSS JOIN qv WHERE n.vec_id <> 0),
cos AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS INT) AS cos_rk
        FROM cos_scored ORDER BY cs DESC, doc_id LIMIT 20),
fused AS (
  SELECT coalesce(bm.doc_id, cos.doc_id) AS doc_id,
         coalesce(bm.bm25_rk, 0) AS bm25_rk,
         coalesce(cos.cos_rk, 0) AS cos_rk
  FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id)
SELECT doc_id, bm25_rk, cos_rk,
       CAST(round(
         (CASE WHEN bm25_rk > 0 THEN CAST(1.0 AS DOUBLE) / ({_RRF_K} + bm25_rk)
               ELSE CAST(0.0 AS DOUBLE) END)
         + (CASE WHEN cos_rk > 0 THEN CAST(1.0 AS DOUBLE) / ({_RRF_K} + cos_rk)
                 ELSE CAST(0.0 AS DOUBLE) END), 6) AS DOUBLE) AS rrf
FROM fused
"""


@register("rrf_fusion", oracle=_rrf_oracle)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of BM25 top-20 and cosine top-20."""
    from flink_ms_spark.plans.pipeline import q_bm25_search

    bm = q_bm25_search(spark, sf_dir)
    w_bm = Window.orderBy(F.desc("bm25"), F.col("doc_id"))
    bm = bm.select("doc_id", F.row_number().over(w_bm).cast("int").alias("bm25_rk"))

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    norms = emb.select(
        "vec_id",
        "v",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("nrm"),
    )
    qv = F.broadcast(
        norms.where(F.col("vec_id") == 0).select(
            F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos_scored = (
        norms.where(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (F.col("nrm") * F.col("qnrm")), 6).alias("cs"),
        )
    )
    # top-20 via sort+limit (TakeOrdered — partial per partition, no
    # corpus-wide single-partition window); the row_number window then
    # ranks only the 20 surviving rows.
    w_cos = Window.orderBy(F.desc("cs"), F.col("doc_id"))
    cos = (
        cos_scored.orderBy(F.desc("cs"), F.col("doc_id"))
        .limit(20)
        .select("doc_id", F.row_number().over(w_cos).cast("int").alias("cos_rk"))
    )
    fused = bm.join(cos, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rk", F.lit(0)).cast("int").alias("bm25_rk"),
        F.coalesce("cos_rk", F.lit(0)).cast("int").alias("cos_rk"),
    )
    rrf = F.round(
        F.when(F.col("bm25_rk") > 0, F.lit(1.0) / (F.lit(_RRF_K) + F.col("bm25_rk")))
        .otherwise(F.lit(0.0))
        + F.when(F.col("cos_rk") > 0, F.lit(1.0) / (F.lit(_RRF_K) + F.col("cos_rk")))
        .otherwise(F.lit(0.0)),
        6,
    )
    return fused.select("doc_id", "bm25_rk", "cos_rk", rrf.alias("rrf"))


# --------------------------------------------------------------------------
# Token-balanced shard manifest: hash-mod assignment of docs to 16
# output shards plus the per-shard doc/token ledger and its imbalance
# vs the mean. Hash-mod (not cumulative-sum packing) is the form that
# scales: one shuffle, no global ordering, and the law of large
# numbers bounds skew at real corpus sizes — the manifest's `skew`
# column is exactly the check that it did. (Greedy token-packed shards
# need a global prefix sum — a sequential bottleneck at 100 TB.)

_N_SHARDS = 16

_SHARD_ORACLE = f"""
WITH g AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_N_SHARDS} AS shard,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents),
cells AS (SELECT shard, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM g GROUP BY shard)
SELECT CAST(shard AS INT) AS shard, n_docs, total_tokens,
       CAST(round(CAST(total_tokens AS DOUBLE)
                  / avg(total_tokens) OVER () - 1.0, 6) AS DOUBLE) AS skew
FROM cells
"""


@register("shard_manifest", oracle=_SHARD_ORACLE)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-mod shard assignment with per-shard token ledger + skew."""
    from flink_ms_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % _N_SHARDS
        ).alias("shard"),
        token_count("text").alias("n_tokens"),
    )
    cells = g.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    w = Window.partitionBy()
    return cells.select(
        F.col("shard").cast("int").alias("shard"),
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.avg("total_tokens").over(w)
            - F.lit(1.0),
            6,
        ).alias("skew"),
    )


# --------------------------------------------------------------------------
# Token-BALANCED shard assignment — the writer-side complement of the
# hash-mod manifest above: shards are contiguous token-budget slices of
# the deterministic doc order, so every shard lands within one document
# of the ideal total/n token budget (hash-mod balances only in
# expectation; heavy-tailed doc lengths skew it). Spark computes the
# exact running token total with the two-phase bucketed rank
# (operators/mixing.py — no single-partition window over the corpus);
# the single-node oracle may use a plain window.

_TOKEN_SHARD_ORACLE = f"""
WITH w AS (SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
        sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS cum,
        sum(n_tokens) OVER () AS total
      FROM w),
a AS (SELECT doc_id, n_tokens,
        CAST(((cum - n_tokens) * {_N_SHARDS}) // total AS INT) AS shard
      FROM c)
SELECT shard, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(round(CAST(sum(n_tokens) AS DOUBLE)
                  / (SELECT sum(n_tokens) / {_N_SHARDS} FROM w) - 1.0, 6)
            AS DOUBLE) AS skew
FROM a GROUP BY shard
"""


@register("token_balanced_shards", oracle=_TOKEN_SHARD_ORACLE)
def q_token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard ledger under contiguous token-budget sharding: shard =
    ((running_tokens_before_doc) * n) div total — every shard within one
    doc of the ideal budget, exact at any scale via the bucketed
    two-phase running total."""
    from flink_ms_spark.operators.mixing import bucketed_global_rank
    from flink_ms_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    ranked = bucketed_global_rank(
        docs,
        bucket=(F.col("doc_id") / F.lit(1024)).cast("long"),
        order_cols=[F.col("doc_id").asc()],
        weight=F.col("n_tokens"),
    )
    a = ranked.withColumn(
        "shard",
        F.expr(f"CAST((cum - n_tokens) * {_N_SHARDS} div total AS INT)"),
    )
    per = a.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    tot = docs.agg(
        (F.sum("n_tokens") / F.lit(_N_SHARDS)).cast("double").alias("_budget")
    )
    return per.crossJoin(tot).select(
        "shard",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("_budget") - 1.0, 6
        ).alias("skew"),
    )


# --------------------------------------------------------------------------
# BPE merge learning (Sennrich et al. 2016): the first 8 merges over
# corpus word frequencies — the artifact a tokenizer trainer ships.
# The corpus is touched exactly once (word_counts); every round after
# is vocabulary-sized. The argmax collect per round is the inherently
# sequential part of BPE (1 row/round — bounded driver work). Oracle:
# deferred single-node Python replay of the identical integer-count
# algorithm over the same parquet (independent recomputation, same
# pattern as the PQ/zlib oracles — exact, integers only).

_N_BPE_MERGES = 8


def _bpe_oracle() -> str:
    import os as _os
    import re as _re
    from collections import Counter

    import duckdb as _duckdb

    sf_dir = _os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")
    con = _duckdb.connect()
    texts = con.execute(
        "SELECT text FROM read_parquet(?)",
        [_os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    wc: Counter[str] = Counter()
    for (text,) in texts:
        for w in _re.split("[^a-z]+", (text or "").lower()):
            if w:
                wc[w] += 1
    vocab = {tuple(w): n for w, n in wc.items()}
    out = []
    for step in range(1, _N_BPE_MERGES + 1):
        pc: Counter[tuple[str, str]] = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merged = a + b
        out.append((step, a, b, merged, n))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = merged
                else:
                    acc.append(s)
            k = tuple(acc)
            nxt[k] = nxt.get(k, 0) + cnt
        vocab = nxt
    rows = ", ".join(
        f"({s}, '{a}', '{b}', '{m}', {n})" for s, a, b, m, n in out
    )
    return (
        "SELECT CAST(step AS INT) AS step, left_, right_, merged, "
        "CAST(pair_count AS BIGINT) AS pair_count "
        + values_clause(rows, "t(step, left_, right_, merged, pair_count)")
    )


@register("bpe_merges", oracle=_bpe_oracle)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges over the corpus word frequencies."""
    from flink_ms_spark.operators.text import bpe_merges

    out = bpe_merges(load_table(spark, sf_dir, "documents"), n_merges=_N_BPE_MERGES)
    # `left`/`right` are reserved-ish in DuckDB VALUES aliases — align
    # on left_/right_ on both engines
    return out.select(
        "step",
        F.col("left").alias("left_"),
        F.col("right").alias("right_"),
        "merged",
        "pair_count",
    )


# --------------------------------------------------------------------------
# Perplexity-bucketed mixing (CCNet, Wenzek et al. 2020): rank every
# doc by its unigram-LM mean NLL within its language and cut into
# head/middle/tail terciles — the bucket column CCNet uses to weight
# clean vs noisy text in the training mix. Reuses lm_score's model;
# the tercile is an ntile over (avg_nll, doc_id) per language — a
# per-language sort of doc-level SCORES (not corpus text), the same
# model-scale sort power_user_share already budgets for.

_PPL_BUCKETS_ORACLE = """
WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM documents),
v AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM v),
s AS (SELECT t.doc_id, -ln(v.c / tot.n) AS nll
      FROM toks t JOIN v USING (tok) CROSS JOIN tot),
scored AS (SELECT doc_id, CAST(round(avg(nll), 6) AS DOUBLE) AS avg_nll
           FROM s GROUP BY doc_id),
ranked AS (SELECT d.lang, sc.doc_id, sc.avg_nll,
                  ntile(3) OVER (PARTITION BY d.lang
                                 ORDER BY sc.avg_nll, sc.doc_id) AS tier
           FROM scored sc JOIN documents d USING (doc_id))
SELECT lang,
       CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       CAST(round(avg(avg_nll), 6) AS DOUBLE) AS mean_nll
FROM ranked GROUP BY lang, tier
"""


@register("perplexity_buckets", oracle=_PPL_BUCKETS_ORACLE)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail LM-score terciles per language (CCNet mix)."""
    from flink_ms_spark.plans.pipeline import q_lm_score

    scored = q_lm_score(spark, sf_dir).select("doc_id", "avg_nll")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    ranked = scored.join(docs, "doc_id").withColumn(
        "tier",
        F.ntile(3).over(
            Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
        ),
    )
    return (
        ranked.withColumn(
            "bucket",
            F.when(F.col("tier") == 1, "head")
            .when(F.col("tier") == 2, "middle")
            .otherwise("tail"),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("avg_nll"), 6).alias("mean_nll"),
        )
    )


# --------------------------------------------------------------------------
# Duplicate-line scrub (CCNet, Wenzek et al. 2019): a normalized line
# seen in >= 3 distinct documents is boilerplate and is cut from every
# document. This is the line-granularity sibling of substring_dedup —
# the cheapest of the three dedup granularities (line < span < doc)
# and the one production web pipelines run FIRST, because nav bars and
# cookie banners dominate raw crawl bytes. Scale notes in
# operators/text.py:drop_duplicated_lines.

_LINE_DEDUP_ORACLE = """
WITH l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
lines AS (SELECT doc_id, j AS pos, ls[j] AS line,
                 lower(regexp_replace(ls[j], '^\\s+|\\s+$', '', 'g')) AS norm
          FROM l0, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS j) t),
boiler AS (SELECT norm FROM lines WHERE norm <> ''
           GROUP BY norm HAVING count(DISTINCT doc_id) >= 3),
j AS (SELECT l.doc_id, l.pos, l.line, b.norm AS bn
      FROM lines l LEFT JOIN boiler b USING (norm))
SELECT doc_id,
       count(*) AS n_lines,
       CAST(count(*) FILTER (WHERE bn IS NULL) AS BIGINT) AS n_lines_kept,
       coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE bn IS NULL),
                '') AS text_clean
FROM j GROUP BY doc_id
"""


@register("line_dedup", oracle=_LINE_DEDUP_ORACLE)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-line removal (line in >=3 distinct docs
    => boilerplate, dropped everywhere; blank lines untouched)."""
    from flink_ms_spark.operators.text import drop_duplicated_lines

    docs = load_table(spark, sf_dir, "documents")
    return drop_duplicated_lines(docs, min_docs=3)


# --------------------------------------------------------------------------
# Rank-normalized quality blend: three orthogonal cheap signals
# (length, word count, alphabetic ratio) are each converted to an
# exact global percentile and averaged — the standard way to combine
# incommensurable quality scores without hand-tuned scales (each
# signal contributes uniformly by construction). Ties broken by
# doc_id so both engines rank identically. The Spark side computes
# each EXACT global rank with the two-phase bucketed rank
# (operators/mixing.py:bucketed_global_rank) — three keyed shuffles +
# three doc_id joins, never a single-partition `row_number() OVER
# (ORDER BY ...)` window: at corpus scale that window is one task
# holding the whole corpus.

_QUALITY_BLEND_ORACLE = """
WITH sig AS (
  SELECT doc_id, n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_words,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / greatest(n_chars, 1) AS alpha_ratio
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars, doc_id) AS r_len,
         row_number() OVER (ORDER BY n_words, doc_id) AS r_word,
         row_number() OVER (ORDER BY alpha_ratio, doc_id) AS r_alpha,
         count(*) OVER () AS n
  FROM sig)
SELECT doc_id,
  CAST(round((r_len - 1) / CAST(n - 1 AS DOUBLE), 6) AS DOUBLE) AS len_pct,
  CAST(round((r_word - 1) / CAST(n - 1 AS DOUBLE), 6) AS DOUBLE) AS word_pct,
  CAST(round((r_alpha - 1) / CAST(n - 1 AS DOUBLE), 6) AS DOUBLE) AS alpha_pct,
  CAST(round((round((r_len - 1) / CAST(n - 1 AS DOUBLE), 6)
            + round((r_word - 1) / CAST(n - 1 AS DOUBLE), 6)
            + round((r_alpha - 1) / CAST(n - 1 AS DOUBLE), 6)) / 3, 6)
       AS DOUBLE) AS blend
FROM r
"""


@register("quality_blend", oracle=_QUALITY_BLEND_ORACLE)
def q_quality_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-of-percentiles quality score over length / word count /
    alphabetic ratio, exact global ranks via the two-phase bucketed
    rank (no single-partition window)."""
    from flink_ms_spark.operators.mixing import bucketed_global_rank

    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.trim("text"), "\\s+")).alias("n_words"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
            / F.greatest("n_chars", F.lit(1))
        ).alias("alpha_ratio"),
    )

    def pct(order_col: str, bucket, name: str) -> DataFrame:
        ranked = bucketed_global_rank(
            sig,
            bucket=bucket,
            order_cols=[F.col(order_col).asc(), F.col("doc_id").asc()],
        )
        return ranked.select(
            "doc_id",
            F.round(
                (F.col("pos") - 1) / (F.col("total") - 1).cast("double"), 6
            ).alias(name),
        )

    lp = pct("n_chars", F.col("n_chars").cast("long"), "len_pct")
    wp = pct("n_words", F.col("n_words").cast("long"), "word_pct")
    ap = pct("alpha_ratio", F.floor(F.col("alpha_ratio") * 100).cast("long"), "alpha_pct")
    out = lp.join(wp, "doc_id").join(ap, "doc_id")
    return out.select(
        "doc_id",
        "len_pct",
        "word_pct",
        "alpha_pct",
        F.round(
            (F.col("len_pct") + F.col("word_pct") + F.col("alpha_pct")) / 3, 6
        ).alias("blend"),
    )


# --------------------------------------------------------------------------
# Snapshot-incremental dedup: dedup a NEW crawl snapshot against the
# EXISTING corpus — the asymmetric form production pipelines run on
# every CommonCrawl drop (existing docs are NEVER touched; only new
# docs are dropped). Fixture split is deterministic: doc_id % 3 == 0
# plays the new snapshot, the rest the standing corpus. Two drop
# tiers, counted separately so the triage reads where the mass went:
#   cross  — new doc's exact text digest already exists in the corpus
#            (one digest semi-join; at scale the corpus side is a
#            pre-built digest index, not a rescan);
#   intra  — among the surviving new docs, later doc_ids of a digest
#            group (min-id canonical, the dedup_exact convention).
# The near-dup analogue of this operator is the streaming MinHash
# registry (streaming/neardup.py), which is incremental by
# construction; this query pins the exact tier's batch semantics.
# Scale: two shuffles on a 16-byte digest, group width = duplicate
# multiplicity; text never shuffles (digest computed map-side).

_SNAPSHOT_DEDUP_ORACLE = """
WITH d AS (SELECT doc_id, source, md5(text) AS dg,
                  (doc_id % 3 = 0) AS is_new FROM documents),
ex AS (SELECT DISTINCT dg FROM d WHERE NOT is_new),
new AS (SELECT n.doc_id, n.source, n.dg,
               (e.dg IS NOT NULL) AS cross_dup
        FROM d n LEFT JOIN ex e USING (dg) WHERE n.is_new),
surv AS (SELECT *, min(doc_id) OVER (PARTITION BY dg) AS canon
         FROM new WHERE NOT cross_dup)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_new,
  CAST(count(*) FILTER (WHERE cross_dup) AS BIGINT) AS n_cross_dropped,
  CAST(coalesce(s.n_intra, 0) AS BIGINT) AS n_intra_dropped,
  CAST(count(*) FILTER (WHERE NOT cross_dup) - coalesce(s.n_intra, 0)
       AS BIGINT) AS n_kept,
  CAST(round((count(*) FILTER (WHERE NOT cross_dup) - coalesce(s.n_intra, 0))
             / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS kept_rate
FROM new LEFT JOIN (
  SELECT source, count(*) FILTER (WHERE doc_id <> canon) AS n_intra
  FROM surv GROUP BY source) s USING (source)
GROUP BY source, s.n_intra
"""


@register("snapshot_incremental_dedup", oracle=_SNAPSHOT_DEDUP_ORACLE)
def q_snapshot_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of deduping the doc_id%3==0 snapshot against
    the standing corpus: arrivals, cross-snapshot drops, intra-snapshot
    drops (min-id canonical), survivors, kept rate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.md5("text").alias("dg"),
        (F.col("doc_id") % 3 == 0).alias("is_new"),
    )
    ex = d.where(~F.col("is_new")).select("dg").distinct()
    new = (
        d.where("is_new")
        .join(
            ex.withColumn("hit", F.lit(1)), "dg", "left"
        )
        .withColumn("cross_dup", F.col("hit").isNotNull())
        .drop("hit")
    )
    surv = new.where(~F.col("cross_dup")).withColumn(
        "canon", F.min("doc_id").over(Window.partitionBy("dg"))
    )
    intra = surv.groupBy("source").agg(
        F.sum((F.col("doc_id") != F.col("canon")).cast("long")).alias(
            "n_intra"
        )
    )
    base = new.groupBy("source").agg(
        F.count("*").cast("long").alias("n_new"),
        F.sum(F.col("cross_dup").cast("long")).alias("n_cross_dropped"),
        F.sum((~F.col("cross_dup")).cast("long")).alias("n_surv"),
    )
    out = base.join(intra, "source", "left").na.fill({"n_intra": 0})
    return out.select(
        "source",
        "n_new",
        "n_cross_dropped",
        F.col("n_intra").cast("long").alias("n_intra_dropped"),
        (F.col("n_surv") - F.col("n_intra")).cast("long").alias("n_kept"),
        F.round(
            (F.col("n_surv") - F.col("n_intra"))
            / F.col("n_new").cast("double"),
            6,
        ).alias("kept_rate"),
    )


# --------------------------------------------------------------------------
# Content-defined chunk dedup (round 10) — the storage-system view of
# corpus redundancy. Documents are split at ROLLING-HASH boundaries
# (operators/chunking.py — LBFS/restic-style CDC: window 8, min 16,
# max 128, divisor 16), so an edited near-duplicate still shares every
# chunk the edit did not touch; fixed windows (`doc_chunks`) would
# shift all of them. Per source: chunk count, how many occurrences are
# redundant (their md5 already owned by an earlier (doc_id, chunk_idx)
# anywhere in the corpus), and the character volume dedup would save.
#
# Scale: chunking is a narrow map (no shuffle); the canonical-owner
# reduction and the back-join both key on md5 chunk_hash (uniform —
# the only hot keys are genuinely mass-duplicated chunks, which AQE
# skew-split handles); the report is |sources| rows. Oracle: deferred
# scalar-int Python replay of the SAME boundary contract written
# independently of the numpy path (plain ord()/mask arithmetic), exact
# because everything is integer except one final rounded division done
# in SQL on both engines.


def _cdc_chunk_oracle() -> str:
    import hashlib as _hashlib
    import os as _os

    import duckdb as _duckdb

    sf_dir = _os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")
    con = _duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, source, text FROM read_parquet(?) ORDER BY doc_id",
        [_os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    mask = (1 << 64) - 1
    base, w, mn, mx, dv = 1099511628211, 8, 16, 128, 16
    bw = pow(base, w, 1 << 64)
    owner: dict[str, tuple[int, int]] = {}
    per_doc: list[tuple[int, str, list[tuple[int, str]]]] = []
    for doc_id, source, text in rows:
        text = text or ""
        n = len(text)
        h, last = 0, 0
        bounds = []
        for i in range(1, n + 1):
            h = (h * base + ord(text[i - 1])) & mask
            if i > w:
                h = (h - ord(text[i - 1 - w]) * bw) & mask
            if (i - last >= mn and h % dv == 0) or (i - last >= mx):
                bounds.append(i)
                last = i
        if last < n:
            bounds.append(n)
        chunks = []
        start = 0
        for idx, b in enumerate(bounds):
            digest = _hashlib.md5(text[start:b].encode()).hexdigest()
            chunks.append((b - start, digest))
            if digest not in owner:
                owner[digest] = (doc_id, idx)
            start = b
        per_doc.append((doc_id, source, chunks))
    stats: dict[str, list[int]] = {}
    for doc_id, source, chunks in per_doc:
        st = stats.setdefault(source, [0, 0, 0, 0])
        for idx, (length, digest) in enumerate(chunks):
            st[0] += 1
            st[2] += length
            if owner[digest] != (doc_id, idx):
                st[1] += 1
                st[3] += length
    body = ", ".join(
        f"('{src}', {v[0]}, {v[1]}, {v[2]}, {v[3]})"
        for src, v in sorted(stats.items())
    )
    return (
        "SELECT source, CAST(n_chunks AS BIGINT) AS n_chunks, "
        "CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks, "
        "CAST(n_chars_total AS BIGINT) AS n_chars_total, "
        "CAST(dup_chars AS BIGINT) AS dup_chars, "
        "round(CAST(dup_chars AS DOUBLE) * 100 / n_chars_total, 6) "
        "AS dup_pct "
        + values_clause(
            body, "t(source, n_chunks, n_dup_chunks, n_chars_total, dup_chars)"
        )
        + " ORDER BY source"
    )


@register("cdc_chunk_dedup", oracle=_cdc_chunk_oracle)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-defined-chunk dedup report."""
    from flink_ms_spark.operators.chunking import cdc_chunk_spans

    # eager pin: spans feed TWO consumers (canon agg + the flag join),
    # and AQE's concurrent stage futures would otherwise run the
    # Python chunker once per consumer (r14 profile; same race as
    # allpairs_jaccard)
    spans = cdc_chunk_spans(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)
    canon = spans.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("canon")
    )
    flagged = spans.join(canon, "chunk_hash").withColumn(
        "is_dup",
        (F.col("doc_id") != F.col("canon.doc_id"))
        | (F.col("chunk_idx") != F.col("canon.chunk_idx")),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_chunks"),
            F.sum("length").cast("long").alias("n_chars_total"),
            F.sum(F.when(F.col("is_dup"), F.col("length")).otherwise(0))
            .cast("long")
            .alias("dup_chars"),
        )
        .withColumn(
            "dup_pct",
            F.round(
                F.col("dup_chars").cast("double") * 100
                / F.col("n_chars_total"),
                6,
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Inverted-index build (round 10) — the postings-list materialization
# step of a search index (term -> document frequency + the head of the
# sorted postings list), for the 100 highest-df terms (ties broken by
# token, so the cut is deterministic at any scale). tfidf/heavy-hitter
# queries count terms; this one materializes WHERE each term lives,
# which is the artifact a retrieval system actually ships.
#
# Scale: df is a pure count (partial-aggregating). The postings head
# is the classic unbounded-collect trap — collect_list per term
# explodes on stopword-grade terms — so the Spark side computes it as
# a TWO-PHASE BOUNDED min-k: per (term, salt=doc_id%16) keep the 10
# smallest doc_ids (partial state <= 10 rows), then merge the <=16
# partial heads per term and cut to 10. The 10 global smallest are
# always among the per-salt 10 smallest, so this is exact, and no
# aggregation state ever exceeds 160 ids regardless of corpus size.
# Only the 100 surviving terms (broadcast semi-join) reach the
# postings stage at all.

_INVERTED_INDEX_ORACLE = """
WITH raw AS (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                      AS token
             FROM documents),
toks AS (SELECT DISTINCT doc_id, token FROM raw WHERE length(token) >= 3),
dfx AS (SELECT token, count(*) AS df FROM toks GROUP BY token),
top AS (SELECT token, df FROM dfx ORDER BY df DESC, token LIMIT 100),
heads AS (SELECT t.token,
                 array_to_string(list_sort(list(t.doc_id))[1:10], ',')
                   AS postings_head
          FROM toks t JOIN top USING (token) GROUP BY t.token)
SELECT top.token, CAST(top.df AS BIGINT) AS df, heads.postings_head
FROM top JOIN heads USING (token)
ORDER BY df DESC, token
"""


@register("inverted_index", oracle=_INVERTED_INDEX_ORACLE)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100-df inverted index with bounded postings heads."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), "[^a-z0-9]+"),
                        lambda x: F.length(x) >= 3,
                    )
                )
            ).alias("token"),
        )
    )
    dfx = toks.groupBy("token").agg(F.count("*").alias("df"))
    top = dfx.orderBy(F.desc("df"), "token").limit(100)
    # two-phase bounded min-k postings head (see block comment)
    part = (
        toks.join(F.broadcast(top.select("token")), "token")
        .groupBy("token", F.pmod("doc_id", F.lit(16)).alias("salt"))
        .agg(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10).alias(
                "part_head"
            )
        )
    )
    heads = part.groupBy("token").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("part_head"))), 1, 10)
        .alias("head10")
    )
    return (
        top.join(heads, "token")
        .select(
            "token",
            "df",
            F.array_join(
                F.transform(F.col("head10"), lambda x: x.cast("string")), ","
            ).alias("postings_head"),
        )
        .orderBy(F.desc("df"), "token")
    )
