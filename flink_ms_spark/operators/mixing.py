"""Data-mixing and sampling operators for training-corpus assembly.

The four pillars of deciding WHAT a model trains on, each as a
DataFrame-in/DataFrame-out operator with ANSI-SQL-reproducible math
(md5 hashing, rational arithmetic, explicit rounding) so every query
has a DuckDB oracle:

- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed-unigram
  bag-of-buckets log-likelihood ratio of a target domain vs the raw
  corpus. Scale: one token explode + two model-scale (n_buckets-row)
  aggregates broadcast back — no pairwise work, one shuffle per agg.
- UniMax language allocation (Chung et al. 2023): epoch-capped
  water-filling of a total token budget over languages. The per-lang
  table is model-scale (|langs| rows), so the waterfill is pure
  window math — closed form, no iteration.
- Temperature-scaled sampling (multilingual standard since mBERT):
  p_l ∝ share_l^(1/T).
- Deterministic epoch ordering: round-robin source interleave and a
  seeded md5 shuffle — reproducible global training order without a
  stateful shuffler. Scale: one global sort (range partition) — the
  same cost any "write the epoch in order" job pays.
- Quality curriculum: cumulative-token phase assignment over a
  quality ordering (easy→hard curriculum binned by token budget).

No counterpart in the reference (its scope is model serving:
`als-ms/src/main/java/de/tub/it4bi/modelserving/qs/ALSKafkaConsumer.java`
consumes a finished model); this family is north-star scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_ms_spark.operators.text import token_count, tokens
from flink_ms_spark.partitioning import FANOUT_KB_PER_TASK, fan_out


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic hash bucket reproducible in DuckDB:
    first 15 md5 hex digits as int, mod n_buckets."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % n_buckets)


def dsir_weights(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document DSIR importance log-weight: the sum over tokens of
    ``log(p_target(bucket) / p_raw(bucket))`` where both distributions
    are add-1-smoothed hashed-unigram bag-of-buckets models
    (``n_buckets`` md5 buckets), target = docs from ``target_source``,
    raw = the whole corpus. High weight ⇒ doc looks like the target
    domain ⇒ keep when resampling.

    Returns (doc_id, n_tokens, logw) with logw rounded to 6 dp.

    Cross-engine determinism: per-bucket log-ratios are rounded to
    6 dp FIRST, then the per-doc weight is a sum of (count × ratio)
    products of already-rounded values — the final 6-dp round (the
    value the DuckDB oracle pins) has ~1e-10 of slack against float
    summation-order drift because the summands are scaled integers.

    Scale: token explode is a narrow map (fan_out restores
    parallelism on single-split inputs); bucket counting is two
    ``n_buckets``-row aggregates; the ratio table broadcasts back onto
    the per-(doc, bucket) counts; one keyed agg by doc. Nothing is
    quadratic and no vocabulary-sized state exists — the model IS the
    n_buckets-row table (the entire point of hashed DSIR features).
    """
    tok = fan_out(
        docs.select(id_col, source_col, text_col),
        kb_per_task=FANOUT_KB_PER_TASK,
    ).select(
        F.col(id_col),
        F.col(source_col),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    tok = tok.withColumn("bkt", md5_bucket("t", n_buckets)).drop("t")

    # ONE shuffle reduces the token stream to ≤ n_buckets rows per doc;
    # everything downstream derives from this bounded table, which is
    # materialized so its three consumers don't re-explode the corpus.
    # EAGER localCheckpoint, not lazy persist: the consumers share one
    # plan and AQE's concurrent stage futures race a lazy persist into
    # recomputing the corpus explode per consumer (r14 profile; same
    # fix as allpairs_jaccard).
    per_doc_bkt = (
        tok.groupBy(id_col, source_col, "bkt")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    raw = per_doc_bkt.groupBy("bkt").agg(F.sum("n").alias("n_raw"))
    tgt = (
        per_doc_bkt.where(F.col(source_col) == target_source)
        .groupBy("bkt")
        .agg(F.sum("n").alias("n_tgt"))
    )
    # model-scale (n_buckets rows): totals via an unpartitioned window
    spine = raw.join(tgt, "bkt", "left").na.fill({"n_tgt": 0})
    w_all = Window.partitionBy()
    # per-bucket log-ratio scaled to an INTEGER micro-nat value: the
    # per-doc weight is then an exact integer sum — float summation
    # order cannot flip the final rounding (cross-engine contract)
    ratio = spine.select(
        "bkt",
        F.round(
            (
                F.log(
                    (F.col("n_tgt") + F.lit(1))
                    / (F.sum("n_tgt").over(w_all) + F.lit(n_buckets))
                )
                - F.log(
                    (F.col("n_raw") + F.lit(1))
                    / (F.sum("n_raw").over(w_all) + F.lit(n_buckets))
                )
            )
            * F.lit(1000000.0),
            0,
        )
        .cast("long")
        .alias("lr6"),
    )
    return (
        per_doc_bkt.join(F.broadcast(ratio), "bkt")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("int").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("lr6")) / F.lit(1000000.0), 6).alias(
                "logw"
            ),
        )
    )


def unimax_alloc(
    docs: DataFrame,
    budget_frac: float = 0.5,
    max_epochs: int = 2,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation: water-fill a total token budget
    (``budget_frac`` × corpus tokens) across languages, capping each
    language at ``max_epochs`` passes over its data. Languages too
    small to absorb an equal share contribute everything they have
    (up to the epoch cap); the leftover budget spreads uniformly over
    the rest — the closed-form waterfill level θ* is the smallest
    per-rank candidate level that fits under that rank's capacity.

    Returns (lang, n_tokens, cap_tokens, alloc_tokens, epochs) —
    alloc/epochs rounded to 4/6 dp.

    Scale: the per-language table is model-scale (|langs| rows ≪
    cluster memory at any corpus size), so after ONE corpus-wide
    token-count aggregate the waterfill itself is window math over a
    tiny table. This mirrors how mixing weights are computed in
    practice: corpus touched once, allocation solved on the summary.
    """
    per_lang = docs.groupBy(lang_col).agg(
        F.sum(token_count(F.col(text_col))).alias("n_tokens")
    )
    w_all = Window.partitionBy()
    w_asc = Window.partitionBy().orderBy(
        F.col("cap").asc(), F.col(lang_col).asc()
    )
    t = (
        per_lang.withColumn("cap", F.col("n_tokens") * F.lit(max_epochs))
        .withColumn("budget", F.round(F.sum("n_tokens").over(w_all) * F.lit(budget_frac), 0))
        .withColumn("rk", F.row_number().over(w_asc))
        .withColumn("k", F.count("*").over(w_all))
        .withColumn(
            "prev_cap_sum",
            F.coalesce(
                F.sum("cap").over(w_asc.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "theta",
            (F.col("budget") - F.col("prev_cap_sum"))
            / (F.col("k") - F.col("rk") + F.lit(1)),
        )
    )
    # θ* = the waterfill level: the theta of the FIRST (ascending-
    # capacity) rank whose equal-share candidate fits under its own
    # capacity. theta is monotone increasing before that crossing and
    # meaningless after it (the cap-prefix formula assumes exhausted
    # predecessors), so selecting by min crossing RANK — not min theta
    # — is what makes the closed form correct.
    t = t.withColumn(
        "cross_rk",
        F.min(F.when(F.col("cap") >= F.col("theta"), F.col("rk"))).over(w_all),
    ).withColumn(
        "theta_star",
        F.max(F.when(F.col("rk") == F.col("cross_rk"), F.col("theta"))).over(w_all),
    )
    return t.select(
        lang_col,
        "n_tokens",
        F.col("cap").alias("cap_tokens"),
        F.round(
            F.least(F.col("cap").cast("double"), F.coalesce("theta_star", F.col("cap").cast("double"))),
            4,
        ).alias("alloc_tokens"),
        F.round(
            F.least(F.col("cap").cast("double"), F.coalesce("theta_star", F.col("cap").cast("double")))
            / F.col("n_tokens"),
            6,
        ).alias("epochs"),
    )


def temperature_mix(
    docs: DataFrame,
    temperature: float = 3.0,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled language sampling weights:
    ``p_l ∝ share_l^(1/T)`` — T=1 is proportional sampling, T→∞ is
    uniform; 3.0-ish is the common multilingual pretraining setting.

    Returns (lang, n_docs, n_tokens, raw_share, temp_share, boost),
    shares rounded to 6 dp, boost = temp_share / raw_share (how much
    the language is up/down-sampled vs natural frequency).

    Scale: one corpus aggregate to a |langs|-row table, then pure
    scalar math — same summary-table shape as unimax_alloc.
    """
    per_lang = docs.groupBy(lang_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    t = per_lang.withColumn(
        "raw_share", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    ).withColumn("pw", F.pow(F.col("raw_share"), F.lit(1.0 / temperature)))
    return t.select(
        lang_col,
        "n_docs",
        "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("pw") / F.sum("pw").over(w_all), 6).alias("temp_share"),
        F.round(F.col("pw") / F.sum("pw").over(w_all) / F.col("raw_share"), 6).alias(
            "boost"
        ),
    )


def _bucketed_ranks(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    weight: Column | None = None,
) -> DataFrame:
    """Distributed exact global ranking WITHOUT the single-partition
    window Spark plans for ``row_number() OVER (ORDER BY …)``: the
    caller supplies a deterministic ORDERED bucket expression (bucket
    id ascends with the sort key), we aggregate per-bucket counts (a
    model-scale table — |buckets| rows), prefix-sum the offsets on
    that tiny table, broadcast them back, and rank WITHIN buckets with
    a keyed (fully parallel) window. ``pos = offset + within-rank``.

    With ``weight``, also emits ``cum`` — the exact running weighted
    total in global order (same offset trick on the weight sums) —
    and ``total``. The heavy shuffle is keyed on the bucket column;
    nothing large ever passes through one task.
    """
    b = df.withColumn("_bkt", bucket)
    wsum = (weight if weight is not None else F.lit(1)).alias("_wrow")
    b = b.withColumn("_wrow", wsum)
    off = b.groupBy("_bkt").agg(
        F.count("*").alias("_n"), F.sum("_wrow").alias("_wsum")
    )
    w_off = (
        Window.partitionBy()
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy()
    off = (
        off.withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .withColumn("_woff", F.coalesce(F.sum("_wsum").over(w_off), F.lit(0)))
        .withColumn("total", F.sum("_wsum").over(w_all))
        .drop("_n", "_wsum")
    )
    w_in = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(off), "_bkt")
        .withColumn("pos", (F.row_number().over(w_in) + F.col("_off")).cast("long"))
        .withColumn(
            "cum",
            F.sum("_wrow").over(w_in.rowsBetween(Window.unboundedPreceding, 0))
            + F.col("_woff"),
        )
        .drop("_bkt", "_off", "_woff", "_wrow")
    )


#: Public name for the two-phase distributed global rank — the catalog
#: uses it wherever exact rank/ntile semantics must survive data-scale
#: inputs (users, customers) without a single-partition window.
bucketed_global_rank = _bucketed_ranks


def ntile_expr(n: int):
    """Exact ANSI NTILE(n) derived from ``bucketed_global_rank``'s
    pos/total columns: the first ``total mod n`` tiles hold
    ``total div n + 1`` rows, the rest ``total div n`` (front-loaded —
    matching Spark's and DuckDB's window ntile row-for-row, pinned in
    tests/test_mixing.py). NOT ``((pos−1)·n) div total + 1``: that
    even-spread form drifts by one row at tile boundaries whenever
    ``total mod n ≠ 0``."""
    big = f"(total div {n} + 1)"
    small = f"greatest(total div {n}, 1)"
    head = f"(total % {n}) * {big}"
    return F.expr(
        f"CAST(CASE WHEN (pos - 1) < {head} THEN (pos - 1) div {big} "
        f"ELSE (total % {n}) + ((pos - 1) - {head}) div {small} END AS INT) + 1"
    )


def interleave_sources(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic round-robin interleave across sources: the global
    training order visits source₁ doc₁, source₂ doc₁, …, source₁
    doc₂, … — the streaming-friendly way to mix corpora without a
    random shuffle (and exactly reproducible between engines/runs,
    unlike sampled shuffles).

    Returns (doc_id, source, pos) with pos the 1-based global order
    by (per-source rank, source).

    Scale: one window per source (keyed shuffle), then the bucketed
    two-phase global rank (:func:`_bucketed_ranks`) — buckets are
    contiguous 64-wide per-source-rank ranges, so each holds ≤
    64 × |sources| rows regardless of corpus size; no single-task
    global sort anywhere in the plan.
    """
    w_src = Window.partitionBy(source_col).orderBy(F.col(id_col).asc())
    ranked = docs.select(id_col, source_col).withColumn(
        "rn", F.row_number().over(w_src)
    )
    out = _bucketed_ranks(
        ranked,
        bucket=((F.col("rn") - 1) / F.lit(64)).cast("long"),
        order_cols=[F.col("rn").asc(), F.col(source_col).asc()],
    )
    return out.select(id_col, source_col, "pos")


def seeded_shuffle(
    docs: DataFrame,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded deterministic global shuffle: order by
    ``md5(seed || ':' || id)`` — a reproducible random permutation
    (new seed ⇒ new epoch order) with no RNG state, identically
    computable in any engine.

    Returns (doc_id, pos). Scale: md5 is uniform, so the first two
    hex digits make 256 perfectly balanced ORDERED buckets for the
    two-phase global rank — the permutation is exact and the plan has
    no single-partition stage (the textbook failure of naive
    ``ORDER BY random()`` epoch shuffles).
    """
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    base = docs.select(id_col).withColumn("_h", h)
    out = _bucketed_ranks(
        base,
        bucket=F.conv(F.substring("_h", 1, 2), 16, 10).cast("long"),
        order_cols=[F.col("_h").asc(), F.col(id_col).asc()],
    )
    return out.select(id_col, "pos")


def quality_curriculum(
    docs: DataFrame,
    n_phases: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum phase assignment: rank documents easy→hard by a
    deterministic quality proxy (ascending mean token length — shorter
    words first, a stand-in for any upstream quality score), then cut
    the ranking into ``n_phases`` phases of (near-)equal TOKEN budget
    — phase 1 is what the model sees first.

    Returns (doc_id, n_tokens, score, phase) — score rounded 6 dp,
    phase ∈ [1, n_phases]. The phase boundary is by cumulative tokens
    (ceil of the token-share), not doc count: a curriculum budgets
    training compute, and compute is tokens.

    Scale: the running token total uses the bucketed two-phase rank —
    buckets are score bins (score has a known bounded domain: mean
    token length), offsets are a model-scale table; the only caveat is
    bin skew if scores concentrate, bounded by widening the bin
    factor. No single-partition window.
    """
    scored = docs.select(
        id_col,
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
            / token_count(F.col(text_col)),
            6,
        ).alias("score"),
    )
    out = _bucketed_ranks(
        scored,
        bucket=F.floor(F.col("score") * 8).cast("long"),
        order_cols=[F.col("score").asc(), F.col(id_col).asc()],
        weight=F.col("n_tokens"),
    )
    return out.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "score",
        F.least(
            F.lit(n_phases),
            F.ceil(F.col("cum") * F.lit(n_phases) / F.col("total")).cast("int"),
        ).alias("phase"),
    )
