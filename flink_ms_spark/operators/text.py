"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions / DataFrame ops — JVM-side, codegen'd, no
Python in the row loop. Designed for 100 TB document tables: every
operator is a narrow map (no shuffle) except where aggregation is the
semantics, and every aggregation is keyed by doc so it scales out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_ms_spark.partitioning import fan_out

# Small fixed stopword set used by quality scoring and the marker-based
# language heuristic. Deliberately tiny + deterministic.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# Marker words per language for the n-gram/stopword language-ID
# heuristic. First match in this order wins; 'zh' is the fallback.
LANG_MARKERS = (
    ("en", ("the", "and", "of")),
    ("de", ("der", "die", "das", "und")),
    ("fr", ("le", "la", "les", "et")),
    ("es", ("el", "los", "las", "y")),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (ARRAY<STRING>)."""
    return F.split(F.trim(_c(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    """Token count over whitespace splits."""
    return F.size(tokens(text))


def char_count_no_spaces(text: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(text), r"\s+", ""))


def avg_token_len(text: Column | str) -> Column:
    """Mean token length — a basic quality signal."""
    return char_count_no_spaces(text) / token_count(text)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (array-native, no explode)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.size(toks)


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-score columns: n_tokens, avg_token_len,
    stopword_ratio, upper_ratio, digit_ratio. One narrow map."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "avg_token_len": F.round(avg_token_len(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "upper_ratio": F.round(
                (F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))) / F.length(t), 6
            ),
            "digit_ratio": F.round(
                (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))) / F.length(t), 6
            ),
        }
    )


def predict_lang(text: Column | str) -> Column:
    """Marker-word language-ID heuristic: first language whose marker
    set intersects the token set; fallback 'zh'. Deterministic and
    SQL-expressible (oracle-checkable); accuracy asserted separately on
    crafted multilingual samples in tests."""
    toks = tokens(F.lower(_c(text)))
    expr = F.lit("zh")
    for lang, markers in reversed(LANG_MARKERS):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hit = F.arrays_overlap(toks, marker_arr)
        expr = F.when(hit, F.lit(lang)).otherwise(expr)
    return expr


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. (A rolling/
    winnowed variant is minhash_signatures in dedup.py — this is the
    whole-document form.)"""
    return F.md5(normalize_text(text))


def rolling_fingerprints(
    text: Column | str,
    k: int = 8,
    mod: int = 16,
) -> Column:
    """Rolling-hash fingerprint set: hash every character k-gram of the
    normalized text and keep those where hash % mod == 0 (0-mod-p
    selection — the classic content-defined sampling used for partial
    / plagiarism-style overlap detection; expected density 1/mod).

    Returns a sorted ARRAY<BIGINT> of distinct sampled hashes: two
    documents sharing a k-char run (≥ the sampling gap) share
    fingerprints regardless of where the run sits — the positional
    robustness whole-document digests lack.

    Everything is built-in expressions over one pass of positions —
    map-side only, no shuffle, no UDF.
    """
    norm = normalize_text(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(k)),
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % 2_147_483_647,
    )
    return F.array_sort(
        F.array_distinct(F.filter(hashes, lambda h: h % mod == 0))
    )


#: (pattern, replacement) pairs — kept RE2-compatible so the DuckDB
#: oracle can apply the identical regexes (no backrefs, no lookaround).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    # requires a separator after the country/area part so pure digit
    # runs fall through to the <ID> catch-all
    (r"\+?\(?[0-9]{1,4}\)?[()\-\. ][0-9()\-\. ]{4,}[0-9]", "<PHONE>"),
    (r"[0-9]{9,}", "<ID>"),
)


def scrub_pii(text: Column | str, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS) -> Column:
    """Redact emails / URLs / phone-like runs / long digit runs — the
    standard pre-training scrub pass. Order matters (emails before the
    digit-run catch-all); patterns chain as nested regexp_replace, all
    JVM-side."""
    out = _c(text)
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def bpe_ish_token_count(text: Column | str) -> Column:
    """Rough subword count: words + punctuation runs, the usual
    pre-tokenizer regex shape. Counts matches of \\w+ or single
    non-space punctuation."""
    return F.size(
        F.filter(
            F.split(_c(text), r"(?<=\W)|(?=\W)"),
            lambda p: (F.trim(p) != "") & (p != " "),
        )
    )


def compression_ratio_udf():
    """Arrow-batched compression-ratio scorer: zlib bytes / raw bytes.
    The classic redundancy quality filter (low ratio = repetitive /
    templated text, near-1 = high-entropy noise). This is the
    documented exception to the no-Python-in-hot-paths rule: there is
    no JVM-side zlib expression, so it runs as a vectorized pandas UDF
    (one Python call per Arrow batch, not per row)."""
    import zlib

    import pandas  # noqa: F401 — resolves the UDF's string type hints
    from pyspark.sql.functions import pandas_udf

    def _ratio(s: "pandas.Series") -> "pandas.Series":
        raw = s.fillna("").str.encode("utf-8")
        return raw.map(lambda b: len(zlib.compress(b, 6)) / len(b) if b else 1.0)

    _ratio.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_ratio, "double")


def char_trigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality score under a corpus conditional char-trigram
    LM: fit P(c3 | c1 c2) = count(c1c2c3) / count(c1c2·) over the
    normalized corpus, then score each doc by mean -log2 P over its
    trigrams (≈ bits per char under the model).

    Returns (doc_id, n_trigrams, avg_bits). The model is bounded by
    |alphabet|³ rows, so both model-side joins broadcast; the corpus
    pays two narrow maps plus two map-side-combined aggregations —
    no corpus-scale shuffle beyond the per-doc score agg.
    """
    norm = normalize_text(F.col(text_col))
    # fan_out BEFORE the explode: a single-file scan arrives as ONE
    # partition, and the eager localCheckpoint below would otherwise
    # serialize the whole corpus explode + partial agg behind one task
    # (r14 profile: 3.1 s single-task stage vs ~0.1 s fanned out).
    # Deliberately NOT size-capped (no kb_per_task): the char-trigram
    # explode amplifies ~3x per input byte and its per-task cost is
    # downstream of the repartition — the r14 cap A/B measured 1.25 s
    # uncapped vs 1.66 s at 4 tasks and 3.51 s at 1.
    docs = fan_out(df.select(F.col(id_col).alias("doc_id"), norm.alias("s")))
    tris = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(s) - 2, 1)),"
                " i -> substring(s, i, 3))"
            )
        ).alias("tri"),
    )
    # ONE corpus explode: reduce to per-(doc, trigram) counts first
    # (bounded ≤ distinct-trigrams/doc rows) and materialize — the
    # model aggregate AND the scoring join both read this table instead
    # of re-exploding the corpus. EAGER localCheckpoint, not lazy
    # persist: both consumers sit in one plan and AQE's concurrent
    # stage futures race a lazy persist into recomputing the corpus
    # explode per consumer (r14 profile; same fix as allpairs_jaccard).
    # Per-trigram bits are integer-scaled (micro-bits) so the weighted
    # per-doc sum is exact integer math — summation order cannot move
    # the 6-dp output (the DSIR contract).
    pdt = (
        tris.groupBy("doc_id", "tri")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    model = pdt.groupBy("tri").agg(F.sum("n").alias("c"))
    ctx = model.groupBy(F.substring("tri", 1, 2).alias("cx")).agg(
        F.sum("c").cast("double").alias("cc")
    )
    probs = (
        model.withColumn("cx", F.substring("tri", 1, 2))
        .join(F.broadcast(ctx), "cx")
        .select(
            "tri",
            F.round(
                -F.log2(F.col("c").cast("double") / F.col("cc")) * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("bits6"),
        )
    )
    scored = pdt.join(F.broadcast(probs), "tri")
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_trigrams"),
        F.round(
            F.sum(F.col("n") * F.col("bits6")) / F.sum("n") / F.lit(1000000.0), 6
        ).alias("avg_bits"),
    )


def word_counts(
    df: DataFrame, text_col: str = "text", pattern: str = "[^a-z]+"
) -> DataFrame:
    """(word, wc): corpus word frequencies over lowercase alpha runs —
    the ONE corpus-scale shuffle a tokenizer-training job pays; every
    BPE iteration after it runs on this vocabulary-sized table."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), pattern)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _learn_merges_from_wc(
    wc: dict[str, int], n_merges: int
) -> list[tuple[str, str, str, int]]:
    """Pure-Python BPE merge loop over a word-frequency dict — the
    shared kernel behind bpe_merges' thresholded local fast path and
    learn_bpe_merges_local. Semantics pinned bit-identical to the
    distributed round loop (overlapping adjacent pairs, argmax with
    (count desc, left, right) tie-break, greedy left fold apply)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in wc.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + n
    out: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        m = a + b
        out.append((a, b, m, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = m
                else:
                    acc.append(x)
            k = tuple(acc)
            nxt[k] = nxt.get(k, 0) + n
        vocab = nxt
    return out


def bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    local_threshold: int = 200_000,
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges
    (Sennrich et al. 2016) over the corpus word frequencies.

    Returns the merge table (step, left, right, merged, pair_count) —
    the artifact a tokenizer trainer ships. Per round: adjacent-pair
    counts weighted by word frequency (overlapping pairs counted, the
    classic formulation), argmax with (count desc, left, right)
    tie-break, then a greedy left-to-right fold applies the merge to
    every word's symbol array.

    Scale shape: the corpus is touched exactly once (word_counts);
    each merge round is vocabulary-sized — explode pairs → one
    map-side-combined agg → a 1-row collect (the argmax is inherently
    sequential in BPE) → a narrow fold-map over the vocab. Per-round
    results are persisted and the previous round unpersisted so
    lineage stays flat over many merges.
    """
    spark = df.sparkSession
    wc_df = word_counts(df, text_col)
    # Thresholded local fast path (the dup_clusters pattern): after
    # the ONE corpus-scale aggregate, the vocabulary is model-scale;
    # below the threshold the 2·n_merges tiny Spark jobs per round are
    # pure scheduling overhead, so collect (word, wc) and run the
    # bit-identical Python loop (parity pinned in tests). Above it,
    # the distributed round loop below is the scale path.
    sample = (
        wc_df.limit(local_threshold + 1).collect() if local_threshold else []
    )
    if local_threshold and len(sample) <= local_threshold:
        # the probe rows ARE the vocabulary (limit exceeded the full
        # table) — reuse them instead of re-running the corpus-scale
        # word_counts aggregate a second time for the collect
        wc = {r["word"]: int(r["wc"]) for r in sample}
        rows = [
            (step, a, b, m, cnt)
            for step, (a, b, m, cnt) in enumerate(
                _learn_merges_from_wc(wc, n_merges), start=1
            )
        ]
        return spark.createDataFrame(
            rows,
            "step INT, left STRING, right STRING, merged STRING, pair_count BIGINT",
        )

    # char split: Spark's split keeps a trailing '' — filter it out
    vocab = wc_df.select(
        F.filter(F.split("word", "(?!^)"), lambda s: s != "").alias("syms"), "wc"
    )
    vocab = vocab.persist()
    out: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        # size filter first: sequence(1, 0) DESCENDS in Spark, so a
        # 1-symbol word would index out of bounds
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merged = a + b
        out.append((step, a, b, merged, n))

        def make_fold(_a: str, _b: str, _m: str):
            def fold_step(acc, x):
                hit = (
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_a))
                    & (x == F.lit(_b))
                )
                return F.when(
                    hit,
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(_m))
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return fold_step

        fold_step = make_fold(a, b, merged)

        nxt = vocab.select(
            F.aggregate(
                "syms", F.expr("cast(array() as array<string>)"), fold_step
            ).alias("syms"),
            "wc",
        ).persist()
        nxt.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        out, "step INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


_BPE_CACHE: dict[tuple, list[tuple[str, str]]] = {}


def learn_bpe_merges_local(
    sf_dir: str, n_merges: int = 8, table: str = "documents"
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning from the fixture parquet —
    bit-identical to the distributed :func:`bpe_merges` (pinned in
    tests), shared by the ``bpe_encode`` query and its DuckDB-oracle
    replay so both consume the same artifact (the codebook pattern:
    learning is the registered distributed job, serving consumes the
    learned model). Memoized per fixture identity."""
    import os as _os
    import re as _re

    import pyarrow.parquet as _pq

    f = _os.path.join(sf_dir, f"{table}.parquet")
    st = _os.stat(f)
    key = (f, st.st_mtime_ns, st.st_size, n_merges)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    texts = _pq.read_table(f, columns=["text"]).column("text").to_pylist()
    wc: dict[str, int] = {}
    for t in texts:
        for w in _re.split("[^a-z]+", t.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = [(a, b) for a, b, _m, _n in _learn_merges_from_wc(wc, n_merges)]
    _BPE_CACHE[key] = merges
    return merges


def bpe_encode_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges to the corpus and return per-doc
    tokenization stats: (doc_id, n_words, n_bpe, bpe_per_word).

    Scale design — the merges are applied to the VOCABULARY, not the
    corpus: unique words are bounded (≈1M at web scale) regardless of
    corpus size, so the 8 fold-apply rounds are narrow maps over a
    model-scale table. The corpus pays exactly two shuffles: the
    (doc, word) count agg and the per-doc rollup; the word→n_bpe
    table joins back broadcast (vocabulary outgrowing broadcast ⇒
    same plan with a shuffle join, still vocab-sized). The fold is
    Spark ``aggregate`` (codegen, no Python in the corpus path).
    """
    vtab = word_counts(df, text_col).select(
        "word",
        F.filter(F.split("word", "(?!^)"), lambda s: s != "").alias("syms"),
    )
    for a, b in merges:

        def make_fold(_a: str, _b: str, _m: str):
            def fold_step(acc, x):
                hit = (
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_a))
                    & (x == F.lit(_b))
                )
                return F.when(
                    hit,
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(_m))),
                ).otherwise(F.concat(acc, F.array(x)))

            return fold_step

        vtab = vtab.select(
            "word",
            F.aggregate(
                "syms", F.expr("cast(array() as array<string>)"), make_fold(a, b, a + b)
            ).alias("syms"),
        )
    vtab = vtab.select("word", F.size("syms").alias("n_bpe_word"))

    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda s: s != ""
            )
        ).alias("word"),
    )
    per = doc_words.groupBy(id_col, "word").agg(F.count("*").alias("n"))
    return (
        per.join(F.broadcast(vtab), "word")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("int").alias("n_words"),
            F.sum(F.col("n") * F.col("n_bpe_word")).cast("int").alias("n_bpe"),
            F.round(
                F.sum(F.col("n") * F.col("n_bpe_word")) / F.sum("n"), 6
            ).alias("bpe_per_word"),
        )
    )


def drop_duplicated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """CCNet-style duplicate-line scrub: a line whose normalized form
    (lowercase, trimmed) appears in >= ``min_docs`` DISTINCT documents
    is boilerplate (nav bars, cookie banners, license footers) and is
    removed from every document; blank lines are never counted or
    removed.  Output per doc: ``n_lines``, ``n_lines_kept``, and
    ``text_clean`` (kept lines re-joined in original order).

    Scale story: one shuffle keyed on the normalized line (the corpus
    line-frequency aggregation — countDistinct is per-key, fully
    parallel), one shuffle join of the line table against the
    boilerplate set on the same key (AQE broadcasts it when the
    boilerplate vocabulary is small), and one groupBy(doc_id) to
    reassemble.  Nothing passes through a single task; the quadratic
    trap (comparing documents pairwise) never appears because identity
    is established per-line, not per-pair.  Reassembly order comes
    from ``array_sort`` over (pos, line) structs inside the aggregate
    — no window needed.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn(
        # \s-class strip, not trim(): CRLF corpora split on \n leave a
        # trailing \r, and tab-padded copies must collapse onto the
        # same key — trim() strips only ASCII spaces and would let
        # those variants escape the frequency count
        "norm",
        F.lower(F.regexp_replace("line", r"^\s+|\s+$", "")),
    )
    boiler = (
        lines.filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.countDistinct(id_col).alias("line_docs"))
        .filter(F.col("line_docs") >= min_docs)
        .select("norm", F.lit(1).alias("_dup"))
    )
    flagged = lines.join(boiler, "norm", "left")
    kept_struct = F.when(F.col("_dup").isNull(), F.struct("pos", "line"))
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("text_clean"),
    )
