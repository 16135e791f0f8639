"""JSONL corpus IO — the lingua franca of LLM training data
(one JSON object per line: {"text": ..., "meta": ...}).

Read side is ``spark.read.json`` with an EXPLICIT schema — schema
inference scans the input twice and types drift between shards, both
unacceptable at corpus scale; unknown keys are preserved through a
``meta`` map column when requested. Write side shards by a hash of
the id (stable, balanced) and writes compressed JSONL the way every
tokenizer/trainer expects to consume it.

The reference has no document corpus IO (its sources are ratings/
model text files — SURVEY.md §2.1); this is north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CORPUS_SCHEMA,
    recursive: bool = True,
) -> DataFrame:
    """Read a JSONL document corpus with a pinned schema. PERMISSIVE
    mode turns a corrupt line into an all-NULL row (it does NOT drop
    it), which would silently inflate doc counts, mixing weights and
    dedup denominators — so rows with a NULL ``doc_id`` (the required
    key; no valid corpus line lacks it) are filtered out here. For a
    quarantine flow, add a ``_corrupt STRING`` field to the schema and
    pass ``columnNameOfCorruptRecord=_corrupt`` (the option only works
    when the corrupt-record column exists in the schema)."""
    from pyspark.sql import functions as F

    reader = spark.read.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.json(path).where(F.col("doc_id").isNotNull())


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    compression: str = "gzip",
) -> None:
    """Write a corpus as ``n_shards`` compressed JSONL shards,
    hash-sharded on the id (uniform, deterministic per id — the same
    shard always holds the same doc across rewrites, which keeps
    downstream dedup-by-shard incremental). One shuffle."""
    (
        df.repartition(n_shards, F.crc32(F.col(id_col).cast("string")))
        .write.mode("overwrite")
        .option("compression", compression)
        .json(path)
    )
