"""Deduplication operators for training-data pipelines.

Four families, each DataFrame-in → DataFrame-out and shuffle-architected
for 100 TB:

- **exact**: hash-groupBy on a content digest. One shuffle on the
  digest; group sizes are bounded by true duplicate multiplicity.
- **MinHash + LSH**: shingle → k minhashes → band → bucket-join.
  Candidate generation never compares all pairs: the only shuffle is
  groupBy(band_signature), and pair expansion happens within buckets.
- **SimHash**: per-token hash bits summed per doc (map-side heavy,
  one narrow agg per doc), Hamming-bucket join on the signature.
- **n-gram Jaccard**: exact similarity for a given candidate pair set
  (verification stage after LSH).

Hashing is md5-based (not murmur) so every stage is reproducible in
ANSI SQL for the DuckDB oracle. MinHash pays ONE md5 per shingle; the
k per-seed hashes are derived by affine reseeding in a prime field
(``h_i(x) = (a_i·x + b_i) mod p``, p = 2^31−1) — the standard
universal-hash family, ~k× cheaper than k independent digests and it
shrinks the pre-agg shuffle rows from 32-char strings to BIGINTs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_ms_spark.operators.text import normalize_text, tokens
from flink_ms_spark.partitioning import FANOUT_KB_PER_TASK, fan_out


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct content digest with the group
    size and the keeper (min id) — the survivor-selection form that
    scales (never collects texts)."""
    return (
        fan_out(df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK)
        .select(F.col(id_col), F.md5(normalize_text(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as ARRAY<STRING> (positions 1..len-n+1).

    Documents shorter than ``n`` tokens yield ONE truncated shingle of
    whatever tokens exist: ``try_element_at`` (NULL past the end, vs
    ``element_at`` which THROWS under Spark 4's ANSI default) +
    ``concat_ws`` (skips NULLs) — and the DuckDB oracles mirror it
    with ``concat_ws(' ', t[i], ...)``, whose out-of-range list index
    is NULL-skipped the same way. A bare ``||`` chain on the oracle
    side would instead NULL-propagate the whole shingle."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )


#: Mersenne prime 2^31−1 — field modulus for the affine hash family.
#: Base hash x < p and multipliers < 2^6, so (a·x + b) stays < 2^38:
#: no BIGINT overflow on either engine.
MINHASH_P = 2_147_483_647


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h INT, minhash BIGINT): per doc and seed i, the MIN over
    shingles of ``(a_i·x + b_i) mod p`` where ``x`` is a 60-bit integer
    from md5(shingle) — one digest per shingle regardless of k.

    Shuffle-FREE: map-only over (id, text) — at 100 TB it runs at scan
    speed with zero exchange. The kernel is a mapInPandas batch loop
    over C-implemented ``hashlib.md5`` (guide §4.2: per-element
    interpreted JVM HOF lambdas measured 20-40 µs/shingle at sf0.1 —
    ~14 s CPU per consuming query; hashlib + native int math is ~1.5
    µs/shingle, and the r14 A/B holds the output bit-identical on every
    SF). Tokenization mirrors the JVM expressions EXACTLY: Spark
    ``trim`` strips 0x20 only; Java ``\\s`` is the ASCII class
    ``[ \\t\\n\\x0B\\f\\r]``; ``split`` keeps edge empties; shingles
    past the token end truncate (``concat_ws`` NULL-skip). A NULL text
    yields ZERO rows — this matches the DuckDB oracle
    (``generate_series(1, len(NULL))`` is empty) and is an intentional
    divergence from the pre-r14 JVM form, whose shingles() guard made
    shingles(NULL) = [''] and emitted an empty-shingle signature row
    (ADVICE r14; pinned by test_null_text_docs_emit_no_rows)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("minhash", T.LongType(), False),
        ]
    )
    coeffs = [(2 * h + 1, h * 12_345 + 7) for h in range(1, num_hashes + 1)]
    p = MINHASH_P

    def sigs(batches):
        import hashlib
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        md5 = hashlib.md5
        for pdf in batches:
            ids_out, h_out, m_out = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                t = ws.split(text.strip(" "))
                n_pos = max(len(t) - (shingle_n - 1), 1)
                xs = [
                    int(
                        md5(" ".join(t[i : i + shingle_n]).encode("utf-8"))
                        .hexdigest()[:15],
                        16,
                    )
                    % p
                    for i in range(n_pos)
                ]
                for h, (a, b) in enumerate(coeffs, start=1):
                    m = min((a * x + b) % p for x in xs)
                    ids_out.append(doc_id)
                    h_out.append(h)
                    m_out.append(m)
            yield pd.DataFrame({id_col: ids_out, "h": h_out, "minhash": m_out})

    return fan_out(
        df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
    ).mapInPandas(
        sigs, schema=out_schema
    )


def _band_signatures(
    signatures: DataFrame, id_col: str, band_size: int
) -> DataFrame:
    """(id, band INT, band_sig STRING) — one row per doc per band."""
    if band_size == 1:
        # one-row bands: the band signature IS the row — skip the
        # per-(doc, band) collect_list shuffle entirely
        return signatures.select(
            F.col(id_col),
            (F.col("h") - 1).cast("int").alias("band"),
            F.concat_ws(":", "h", "minhash").alias("band_sig"),
        )
    banded = signatures.withColumn(
        "band", ((F.col("h") - 1) / F.lit(band_size)).cast("int")
    )
    return banded.groupBy(id_col, "band").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_list(F.concat_ws(":", "h", "minhash")))
        ).alias("band_sig")
    )


def lsh_pair_stats(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_size: int = 2,
    max_bucket_size: int = 64,
) -> DataFrame:
    """One-row LSH candidate-volume summary — the curation-log form of
    near-dup discovery: ``n_neardup_pairs`` (distinct a<b candidate
    pairs from buckets within the size cap) and
    ``n_dropped_bucket_docs`` (total doc slots in buckets *over* the
    cap, reported instead of expanded).

    Scale: this is the shape a 100 TB curation run logs. Oversize
    buckets (boilerplate/template text) are never pair-expanded — a
    10^6-doc bucket would mean 10^12 pairs — their volume is summed
    from the bucket *sizes* (one BIGINT per bucket) and surfaced so the
    report stays honest about what was skipped. Kept-bucket expansion
    is bounded by ``max_bucket_size``² per bucket, and both counts come
    out of the same banding scan: one groupBy(band, band_sig) shuffle,
    then a distinct over capped pairs."""
    band_sigs = _band_signatures(signatures, id_col, band_size)
    buckets = (
        band_sigs.groupBy("band", "band_sig")
        .agg(F.collect_set(id_col).alias("_ids"))
        .select("_ids", F.size("_ids").alias("n"))
        .where(F.col("n") >= 2)
    )
    dropped = buckets.where(F.col("n") > max_bucket_size).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_dropped_bucket_docs")
    )
    pairs = (
        buckets.where(F.col("n") <= max_bucket_size)
        .select(F.explode("_ids").alias("a"), F.col("_ids"))
        .select("a", F.explode("_ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_neardup_pairs"))
    )
    return pairs.crossJoin(dropped)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band's full
    signature become candidate pairs (a < b, distinct).

    Scale: groupBy(band, band_sig) buckets; pair expansion is a
    self-join *within buckets only*. Skewed buckets (near-identical
    boilerplate at web scale) are the known hot spot — AQE skew-join
    splitting handles moderate skew; ``max_bucket_size`` drops buckets
    beyond it entirely ("template" docs whose quadratic pair expansion
    would dominate the job — at web scale a single boilerplate bucket
    of 10^6 docs means 10^12 pairs; those docs belong in exact-dedup's
    digest groups, not in pairwise verification).
    """
    band_sigs = _band_signatures(signatures, id_col, band_size)
    # Pair expansion WITHOUT a self-join: one groupBy collects each
    # bucket's member set, then a double explode emits the a<b pairs
    # in place. Same result as the bucket self-join but one shuffle
    # fewer (the join would repartition both sides by (band, band_sig)
    # again), the oversize-bucket drop is a free size() predicate on
    # the bucket row, and the quadratic expansion happens inside that
    # row where it is already bounded.
    buckets = (
        band_sigs.groupBy("band", "band_sig")
        .agg(F.collect_set(id_col).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("_ids") <= max_bucket_size)
    return (
        buckets.select(F.explode("_ids").alias("a"), F.col("_ids"))
        .select("a", F.explode("_ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def shingle_rows(
    df: DataFrame,
    shingle_n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc DISTINCT word-``shingle_n``-gram rows (id, s) as a
    map-only mapInPandas kernel — the Python-native form of
    ``explode(shingles(...)).distinct()`` for consumers that key on the
    (id, shingle) SET. Two measured wins over the JVM form (r14): the
    interpreted per-position ``concat_ws`` lambdas cost ~60 µs/shingle
    (17.8 s CPU at sf0.1 in allpairs_jaccard) vs ~1 µs for C
    ``str.join``; and per-doc set-dedup inside the kernel replaces the
    corpus-wide ``distinct()`` exchange outright (distinctness is
    per-doc by construction — the id is part of the key). Shingle
    strings are byte-identical (same trim/split/truncation contract as
    ``minhash_signatures``); a NULL text yields zero rows (explode-of-
    NULL semantics)."""
    out_schema = T.StructType(
        [
            T.StructField("_d", df.schema[id_col].dataType, False),
            T.StructField("s", T.StringType(), False),
        ]
    )

    def rows(batches):
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        for pdf in batches:
            ids_out, s_out = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                t = ws.split(text.strip(" "))
                n_pos = max(len(t) - (shingle_n - 1), 1)
                for s in dict.fromkeys(
                    " ".join(t[i : i + shingle_n]) for i in range(n_pos)
                ):
                    ids_out.append(doc_id)
                    s_out.append(s)
            yield pd.DataFrame({"_d": ids_out, "s": s_out})

    return fan_out(
        df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
    ).mapInPandas(
        rows, schema=out_schema
    )


def shingle_sets(
    df: DataFrame,
    shingle_n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc DISTINCT word-``shingle_n``-gram SETS (id, _xs ARRAY) —
    the packed form of :func:`shingle_rows` (identical shingle strings
    and per-doc dedup, one row per doc instead of one per shingle).
    Callers that need exploded rows select ``explode(_xs)``; callers
    that need whole sets (the allpairs verify stage's intersection
    counts) read the array without a regroup. Insertion order is the
    first-occurrence order of :func:`shingle_rows`; set semantics make
    the order irrelevant to consumers."""
    out_schema = T.StructType(
        [
            T.StructField("_d", df.schema[id_col].dataType, False),
            T.StructField(
                "_xs", T.ArrayType(T.StringType(), False), False
            ),
        ]
    )

    def rows(batches):
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        for pdf in batches:
            ids_out, xs_out = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                t = ws.split(text.strip(" "))
                n_pos = max(len(t) - (shingle_n - 1), 1)
                ids_out.append(doc_id)
                xs_out.append(
                    list(
                        dict.fromkeys(
                            " ".join(t[i : i + shingle_n])
                            for i in range(n_pos)
                        )
                    )
                )
            if not ids_out:
                # an empty object column arrives as float64 and
                # Arrow cannot cast that to list<...> — skip
                continue
            yield pd.DataFrame({"_d": ids_out, "_xs": xs_out})

    return fan_out(
        df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
    ).mapInPandas(
        rows, schema=out_schema
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for given (a, b)
    pairs — the LSH verification stage.

    Implementation: explode distinct shingles per doc once, then two
    semi-structured joins; |A∩B| by join-count, |A∪B| = |A|+|B|−|∩|.
    The doc-side explode is reused across pairs (shuffle on doc id).
    Pass ``shingles_df`` (a distinct (_d, s) set, e.g. already persisted
    by a candidate-generation stage) to skip re-exploding the corpus.
    """
    sh = shingles_df if shingles_df is not None else fan_out(docs).select(
        F.col(id_col).alias("_d"), F.explode_outer(shingles(F.col(text_col), shingle_n)).alias("s")
    ).distinct()
    sizes = sh.groupBy("_d").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("_d").alias("a"), "s")
    sh_b = sh.select(F.col("_d").alias("b"), "s")
    inter = (
        pairs.join(sh_a, "a").join(sh_b, ["b", "s"]).groupBy("a", "b").agg(
            F.count("*").alias("n_inter")
        )
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("_d", "a").withColumnRenamed("n", "n_a"), "a")
        .join(sizes.withColumnRenamed("_d", "b").withColumnRenamed("n", "n_b"), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def allpairs_jaccard(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact all-pairs similarity self-join with prefix filtering
    (AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008):
    every (a, b, jaccard) pair with a < b and word-``shingle_n``-gram
    Jaccard ≥ threshold, NO false negatives (unlike MinHash LSH).

    Scale shape: each doc's shingles are ordered by ascending global
    document frequency (rarest first); only the first
    ``n − ⌈τ·n⌉ + 1`` shingles are indexed — any qualifying pair must
    collide on one of them (prefix-filter lemma), so candidate
    generation is Σ_prefix-token df², not |D|². A length-ratio filter
    (τ·max ≤ min, exact for integer sizes at τ = k/2^m) prunes before
    the exact verify, which rides :func:`ngram_jaccard`'s
    intersection-count join. Shuffles: shingle explode+distinct, df
    agg, per-doc prefix window, candidate join, verify join — all keyed
    on shingle or doc id, none quadratic in |D|.

    Thresholds should sit away from the 6-dp rounding boundary of the
    verify stage (the prefix lemma bounds RAW jaccard).
    """
    from pyspark.sql.window import Window

    # The shingle set feeds FOUR consumers (sizes, dfreq, prefix rows,
    # and the verify stage's intersection join) — materialize it so the
    # corpus is exploded and deduped once, not once per consumer.
    # EAGER localCheckpoint, not lazy persist: AQE submits the
    # consumers' shuffle stages as concurrent futures, and a lazy
    # persist lets every future race to compute the uncached subtree —
    # the r14 profile showed the explode+distinct map stage running
    # FOUR times (identical shuffle writes) under persist(); eager
    # materialization ran the pass once and cut the query ~25% in an
    # interleaved A/B at sf0.1.
    # shingle_sets: hashlib-era Python kernel — per-doc distinct
    # shingles built with C str.join, and the per-doc set dedup makes
    # the corpus-wide distinct() exchange unnecessary (r14: this one
    # stage was 27.8 s summed run / 17.8 s CPU at sf0.1 as interpreted
    # JVM HOF + distinct; the kernel is map-only). r15: the pinned
    # frame is the PACKED per-doc array (5 k rows at sf0.1, not 250 k
    # exploded rows) so the verify stage below can read whole sets
    # without the regroup; the prefix tier explodes it per consumer
    # (a map-side explode over checkpointed blocks).
    sets = shingle_sets(
        docs, shingle_n, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    sh = sets.select("_d", F.explode("_xs").alias("s"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    # per-doc size rides the SAME keyed window pass as the prefix rank
    # (no separate sizes aggregate + join), and candidate rows carry
    # (n_a, n_b) forward so the verify stage needs no size joins either
    # — three fewer stages than the textbook layering.
    w_d = Window.partitionBy("_d")
    prefix = (
        sh.join(dfreq, "s")
        .withColumn("rk", F.row_number().over(w_d.orderBy("df", "s")))
        .withColumn("n", F.count("*").over(w_d))
        .where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + F.lit(1)
        )
    )
    pa = prefix.select(F.col("_d").alias("a"), "s", F.col("n").alias("n_a"))
    pb = prefix.select(F.col("_d").alias("b"), "s", F.col("n").alias("n_b"))
    eps = 1e-9
    cands = (
        pa.join(pb, "s")
        .where(F.col("a") < F.col("b"))
        .where(F.lit(threshold) * F.col("n_b") - F.lit(eps) <= F.col("n_a"))
        .where(F.lit(threshold) * F.col("n_a") - F.lit(eps) <= F.col("n_b"))
        .select("a", "b", "n_a", "n_b")
        .distinct()
    )
    # Verify tier (r15): candidate count is near-dup-scale (256 at
    # sf0.1 vs 250 k shingle rows), so join the candidates against the
    # pinned per-doc sets and take |A∩B| as `size(array_intersect(..))`
    # over the two per-doc DISTINCT arrays — exactly the old
    # intersection join-count, with the verify tier's two exploded-
    # shingle shuffles and its pair×shingle HashAggregate gone from the
    # plan. Join strategy is left to AQE (no broadcast hint): locally
    # it converts to broadcast-hash at runtime once it sees the real
    # candidate size; at corpus scale a huge near-dup candidate list
    # falls back to a keyed shuffle join instead of an OOMing forced
    # broadcast. A candidate pair always shares a prefix shingle, so
    # n_inter ≥ 1 and the old left-join + fill(0) is equivalently this
    # inner path (and a zero-overlap pair would fail the ≥ threshold
    # filter in both shapes anyway).
    inter = (
        sets.select(F.col("_d").alias("a"), F.col("_xs").alias("_xa"))
        .join(cands, "a")
        .join(
            sets.select(F.col("_d").alias("b"), F.col("_xs").alias("_xb")),
            "b",
        )
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("_xa", "_xb")).alias("n_inter"),
        )
    )
    return (
        inter.select(
            "a",
            "b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    tok_hashes: DataFrame | None = None,
) -> DataFrame:
    """(id, simhash STRING of 0/1 bits): per-token md5 hex digits →
    ±1 votes per bit position, bit set if the vote sum is positive.

    Bits come from hex digits of md5(token) (digit parity), so the
    whole pipeline is reproducible in ANSI SQL.

    Shape: one token explode, then ``bits`` COLUMNAR parity sums in a
    single doc-keyed aggregate — never a per-(token, bit) explode (the
    earlier form shuffled tokens×bits rows; 32-bit sigs paid 32× the
    rows for the same information). Vote-sum positivity is equivalent
    to ``2·ones_b > n_tokens`` (ones − (n − ones) > 0), which is what
    the column form tests — ties still emit '0', matching the oracle.
    """
    if not 1 <= bits <= 32:
        # md5 hex has exactly 32 digits; substring(h, 33..) would
        # silently emit a CONSTANT bit (empty string never odd) — a
        # corpus-wide collision in any band covering those positions
        raise ValueError(f"simhash bits must be 1..32, got {bits}")
    # ``tok_hashes`` (id, h=md5(token) rows) lets a caller that already
    # paid the corpus md5 pass (e.g. a minhash family sharing the same
    # token stream) feed it here instead of hashing the corpus twice
    if tok_hashes is None:
        # hashlib + numpy mapInPandas kernel (the r14
        # minhash_signatures pattern): md5 per token in C and the
        # per-bit parity votes vectorized per doc, emitting the final
        # signature string directly — the JVM form exploded the corpus
        # and ran ``bits`` interpreted CASE/instr evals per token row
        # (8.3M evals ≈ 1.5-4 s CPU at sf0.1 for 32 bits). Digit
        # parity == (strpos('0123..f', d) - 1) % 2 == the nibble's low
        # bit; a bit is '1' iff ones strictly beat half the token count
        # (ties → '0'); NULL text yields no row (explode semantics).
        sig_schema = T.StructType(
            [
                T.StructField(id_col, df.schema[id_col].dataType, False),
                T.StructField("simhash", T.StringType(), False),
            ]
        )

        def sig_kernel(batches):
            import hashlib
            import re

            import numpy as np

            ws = re.compile(r"[ \t\n\x0B\f\r]+")
            md5 = hashlib.md5
            for pdf in batches:
                ids_out, sig_out = [], []
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    if text is None:
                        continue
                    hexes = [
                        md5(t.encode("utf-8")).hexdigest()[:bits]
                        for t in ws.split(text.strip(" "))
                    ]
                    arr = np.frombuffer("".join(hexes).encode(), dtype=np.uint8)
                    vals = arr - 48 - (arr >= 97) * 39
                    ones = (vals & 1).reshape(len(hexes), bits).sum(axis=0)
                    n = len(hexes)
                    ids_out.append(doc_id)
                    sig_out.append(
                        "".join("1" if 2 * o > n else "0" for o in ones)
                    )
                yield pd.DataFrame({id_col: ids_out, "simhash": sig_out})

        return fan_out(
            df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
        ).mapInPandas(
            sig_kernel, schema=sig_schema
        )
    tok = tok_hashes
    ones = [
        F.sum(
            F.expr(
                f"CASE WHEN (instr('0123456789abcdef', substring(h, {b}, 1)) - 1) "
                "% 2 = 1 THEN 1 ELSE 0 END"
            )
        ).alias(f"_o{b}")
        for b in range(1, bits + 1)
    ]
    agg = tok.groupBy(id_col).agg(F.count("*").alias("_n"), *ones)
    bit_cols = [
        F.when(F.col(f"_o{b}") * 2 > F.col("_n"), F.lit("1")).otherwise(F.lit("0"))
        for b in range(1, bits + 1)
    ]
    return agg.select(id_col, F.concat(*bit_cols).alias("simhash"))


def simhash_neardup(
    df: DataFrame,
    bits: int = 16,
    n_bands: int = 4,
    max_hamming: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    tok_hashes: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup via Hamming pigeonholing: split the ``bits``-bit
    signature into ``n_bands`` contiguous bands; any pair within
    ``max_hamming`` differing bits must agree EXACTLY on at least one
    band whenever ``n_bands > max_hamming`` (≤ max_hamming bands can be
    "poisoned"), so the band-equality bucket join has NO false
    negatives. Verify = exact Hamming distance on the full signature.
    Returns (a, b, hamming INT) with a < b, hamming ≤ max_hamming.

    Scale: signatures are one explode + keyed agg (simhash); candidate
    generation is a bucket join on (band, band_sig) — 2^-band_width
    selectivity per band, never all-pairs; the Hamming verify is
    per-candidate-row zip_with column math. Hot buckets (low-entropy
    corpora) behave like LSH template buckets — cap upstream via
    exact dedup, same argument as lsh_candidate_pairs.
    """
    if n_bands <= max_hamming:
        raise ValueError("pigeonhole needs n_bands > max_hamming")
    if bits % n_bands:
        raise ValueError("bits must divide evenly into bands")
    if bits > 32:
        # simhash() draws bits from md5's 32 hex digits; beyond 32 the
        # extra positions would be corpus-wide constants (see its guard)
        raise ValueError("simhash signatures support at most 32 bits")
    width = bits // n_bands
    # ``signatures`` (id, simhash 0/1-string) lets a caller that
    # already built the per-doc signatures (e.g. the
    # dedup_method_agreement base kernel, which derives them from the
    # same md5 pass the minhash side reads) skip the explode +
    # bits-column vote aggregation entirely.
    sig = (
        signatures
        if signatures is not None
        else simhash(
            df, text_col=text_col, id_col=id_col, bits=bits, tok_hashes=tok_hashes
        )
    ).withColumn("_sl", F.conv("simhash", 2, 10).cast("long"))
    banded = sig.select(
        F.col(id_col),
        F.col("_sl"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        F.col("simhash"),
    ).withColumn(
        "band_sig",
        F.expr(f"substring(simhash, band * {width} + 1, {width})"),
    )
    a = banded.select(
        F.col(id_col).alias("a"), F.col("_sl").alias("_sa"), "band", "band_sig"
    )
    b = banded.select(
        F.col(id_col).alias("b"), F.col("_sl").alias("_sb"), "band", "band_sig"
    )
    # verify BEFORE distinct: natural-language corpora concentrate
    # simhash bits (similar token statistics ⇒ similar sigs — the very
    # property that makes simhash work), so collision volume is the hot
    # spot; the XOR+bit_count hamming is a two-instruction filter that
    # collapses millions of collision rows to the near-dup survivors
    # before any dedup shuffle runs
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.expr("_sa ^ _sb")).cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def exact_substring_dedup(
    df: DataFrame,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring dedup at n-token granularity (the removal step
    of Lee et al. 2022): every n-token span occurring more than once
    in the corpus keeps only its first occurrence — global order
    (doc_id, position) — and all later occurrences are cut from their
    documents.

    Returns (doc_id, n_tokens INT, n_removed INT, clean_text) where
    clean_text is the surviving tokens rejoined with single spaces
    (documents shorter than n tokens pass through whitespace-normalized).

    Scale shape: span construction is a narrow map (transform over
    sequence + slice — no shuffle); the one corpus-scale shuffle is
    row_number() over gram groups (key cardinality ~ corpus token
    count, well spread; boilerplate grams are the known hot keys —
    AQE skew handling applies, and template-grade grams belong in
    exact doc-level dedup first). Reassembly shuffles by doc only.
    """
    # Span construction and reassembly are Python kernels (the r14
    # shingle_rows pattern): the interpreted transform/slice/concat_ws
    # HOF cost ~7 s CPU at sf0.1 for the span pass alone, and the
    # original JVM reassembly paid THREE corpus-token-scale exchanges
    # (covered-positions distinct, tokpos anti-join, collect_list
    # regroup). The kernel form keeps exactly ONE token-scale shuffle
    # — row_number over gram groups, the semantics — plus two doc-
    # scale joins; cut positions ride a per-doc set and the cleaned
    # text is rebuilt in one map over (text, cut-list). Tokenization
    # mirrors the JVM contract (see minhash_signatures): strip 0x20,
    # ASCII \s class, edge empties kept, NULL text yields no span/
    # cleaned rows (explode-of-NULL semantics; the base aggregate
    # keeps its JVM form so NULL/size semantics are untouched).
    toks = fan_out(
        df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
    ).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    span_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType, False),
            T.StructField("idx", T.IntegerType(), False),
            T.StructField("gram", T.StringType(), False),
        ]
    )

    def span_kernel(batches):
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        for pdf in batches:
            ids_out, idx_out, g_out = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                t = ws.split(text.strip(" "))
                if len(t) < n:
                    continue
                join = " ".join
                for i in range(len(t) - n + 1):
                    ids_out.append(doc_id)
                    idx_out.append(i + 1)
                    g_out.append(join(t[i : i + n]))
            yield pd.DataFrame(
                {"doc_id": ids_out, "idx": idx_out, "gram": g_out}
            )

    spans = fan_out(
        df.select(id_col, text_col), kb_per_task=FANOUT_KB_PER_TASK
    ).mapInPandas(
        span_kernel, schema=span_schema
    )
    w = Window.partitionBy("gram").orderBy("doc_id", "idx")
    dups = (
        spans.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id", "idx")
    )
    # per-doc cut-start list: doc-scale rows, bounded by dup spans
    rem = dups.groupBy("doc_id").agg(F.collect_set("idx").alias("_cut"))
    clean_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType, False),
            T.StructField("n_kept", T.LongType(), False),
            T.StructField("clean_text", T.StringType(), False),
        ]
    )

    def clean_kernel(batches):
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        for pdf in batches:
            ids_out, k_out, c_out = [], [], []
            for doc_id, text, cut in zip(
                pdf["doc_id"], pdf[text_col], pdf["_cut"]
            ):
                if text is None:
                    continue
                t = ws.split(text.strip(" "))
                if cut is None or len(cut) == 0:
                    kept_toks = t
                else:
                    covered = set()
                    for idx in cut:
                        covered.update(range(int(idx), int(idx) + n))
                    kept_toks = [
                        tok
                        for pos, tok in enumerate(t, start=1)
                        if pos not in covered
                    ]
                ids_out.append(doc_id)
                k_out.append(len(kept_toks))
                c_out.append(" ".join(kept_toks))
            yield pd.DataFrame(
                {"doc_id": ids_out, "n_kept": k_out, "clean_text": c_out}
            )

    cleaned = (
        fan_out(
            df.select(F.col(id_col).alias("doc_id"), text_col),
            kb_per_task=FANOUT_KB_PER_TASK,
        )
        .join(rem, "doc_id", "left")
        .mapInPandas(clean_kernel, schema=clean_schema)
    )
    base = toks.select("doc_id", F.size("t").alias("n_tokens"))
    return base.join(cleaned, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
