"""Pin the NULL-text contract of the dedup kernels (ADVICE r14).

A NULL text emits ZERO rows from every shingle/signature kernel — the
same as the DuckDB oracles (``generate_series(1, len(NULL))`` is
empty), and an intentional divergence from the pre-r14 JVM shingles()
guard, which emitted an empty-shingle row for NULL text."""

from pyspark.sql import types as T

from flink_ms_spark.operators.dedup import (
    minhash_signatures,
    shingle_rows,
    shingle_sets,
    simhash,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, "")], SCHEMA
    )


def test_null_text_docs_emit_no_rows(spark):
    docs = _docs(spark)

    sigs = minhash_signatures(docs, num_hashes=2, shingle_n=3)
    assert sorted(r.doc_id for r in sigs.select("doc_id").distinct().collect()) == [1, 3]

    rows = shingle_rows(docs, shingle_n=3)
    assert sorted(r._d for r in rows.select("_d").distinct().collect()) == [1, 3]

    sets = shingle_sets(docs, shingle_n=3)
    got = {r._d: r._xs for r in sets.collect()}
    assert sorted(got) == [1, 3]
    # empty text still yields its single (empty) shingle — only NULL drops
    assert got[3] == [""]

    sh = simhash(docs, bits=8)
    assert sorted(r.doc_id for r in sh.select("doc_id").distinct().collect()) == [1, 3]


def test_shingle_sets_matches_shingle_rows(spark):
    docs = _docs(spark)
    rows = {
        (r._d, r.s) for r in shingle_rows(docs, shingle_n=3).collect()
    }
    from_sets = {
        (r._d, s)
        for r in shingle_sets(docs, shingle_n=3).collect()
        for s in r._xs
    }
    assert rows == from_sets
