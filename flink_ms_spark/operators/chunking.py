"""Content-defined chunking (CDC) — Rabin-style rolling-hash document
splitting for chunk-level deduplication.

Fixed-window chunking (``doc_chunks``) shifts every boundary when one
character is inserted, so a near-identical document shares almost no
chunks with its original.  Content-defined boundaries are chosen by
the DATA (a rolling hash of the last ``window`` characters hitting a
divisor), so an edit only perturbs the chunks it touches — the rest of
the document still deduplicates.  This is the chunking used by
storage/dedup systems (LBFS, restic, borg) and by chunk-level corpus
dedup; it complements ``substring_dedup`` (span removal) with a
storage-shaped report of how much of the corpus is redundant at chunk
granularity.

Parity note vs the reference (mmziyad/flink-ms): the reference has no
chunking operator at all — this belongs to the LLM-training-data
widening mandate, not the §2 inventory.

Determinism contract (shared with the oracle replay, which is written
as an independent scalar-int implementation in plans/curation.py):

- characters are Unicode code points (``ord``), positions 1-based;
- prefix hash ``P[i] = (P[i-1]*B + c_i) mod 2**64`` with
  ``B = 1099511628211`` (the odd FNV-1a 64 prime — odd, so B is
  invertible mod 2**64 and the prefix trick below works);
- window hash at ``i >= window``:
  ``H[i] = P[i] - B**window * P[i-window]  (mod 2**64)``;
- a CANDIDATE boundary is any ``i`` with ``H[i] % divisor == 0``;
- boundaries are chosen greedily from position 0: the next boundary
  after ``last`` is the smallest candidate ``i >= last + min_len``,
  capped at ``last + max_len`` (a forced boundary when no candidate
  arrives in time — bounds every chunk above and below);
- the document tail past the final boundary is emitted as a chunk
  (it alone may be shorter than ``min_len``).

Scale shape: the whole computation is per-document (mapInPandas, a
narrow map — no shuffle), vectorized with numpy uint64 arithmetic
whose natural wraparound IS the mod-2**64 ring.  The per-chunk greedy
walk touches only candidate positions (~1/divisor of characters).
Chunk hashes are md5 of the chunk text, so downstream dedup joins key
on uniformly distributed strings.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE = 1099511628211  # FNV-1a 64 prime; odd -> invertible mod 2**64
_MASK = (1 << 64) - 1

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("length", T.IntegerType()),
        T.StructField("chunk_hash", T.StringType()),
    ]
)


def chunk_boundaries(
    candidates, n: int, min_len: int, max_len: int
) -> list[int]:
    """Greedy boundary selection from a sorted iterable of candidate
    positions (1-based).  Shared spec for the vectorized Spark path
    and any scalar replay; pure integer logic, no hashing."""
    bounds: list[int] = []
    last = 0
    it = iter(candidates)
    cand = next(it, None)
    while True:
        # skip candidates too close to the previous boundary
        while cand is not None and cand < last + min_len:
            cand = next(it, None)
        nxt = last + max_len if cand is None else min(cand, last + max_len)
        if nxt >= n:
            break
        bounds.append(nxt)
        last = nxt
    if n > 0:
        bounds.append(n)
    return bounds


def _doc_chunks_numpy(
    text: str, window: int, min_len: int, max_len: int, divisor: int
) -> list[tuple[int, int, str]]:
    """(start, length, md5) triples for one document — numpy uint64
    rolling hash, O(n) with no Python per-character loop."""
    import numpy as np

    n = len(text)
    if n == 0:
        return []
    codes = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    with np.errstate(over="ignore"):
        # P[i] = B^i * S[i]  where  S[i] = sum_j c_j * Binv^j  — the
        # multiplicative-scan trick: cumprod/cumsum wrap mod 2**64 in
        # uint64 exactly like the scalar recurrence, and B odd makes
        # Binv = B^-1 mod 2**64 exact.
        binv = np.uint64(pow(BASE, -1, 1 << 64))
        pow_b = np.full(n, np.uint64(BASE), dtype=np.uint64)
        pow_b = np.cumprod(pow_b)  # B^1 .. B^n
        binv_pow = np.full(n, binv, dtype=np.uint64)
        binv_pow = np.cumprod(binv_pow)  # Binv^1 .. Binv^n
        s = np.cumsum(codes * binv_pow)  # S[1..n]
        p = pow_b * s  # P[1..n]
        h = p.copy()
        if n > window:
            bw = np.uint64(pow(BASE, window, 1 << 64))
            h[window:] = p[window:] - bw * p[:-window]
    cand = np.flatnonzero(h % np.uint64(divisor) == 0) + 1  # 1-based
    bounds = chunk_boundaries(cand.tolist(), n, min_len, max_len)
    out = []
    start = 0
    for b_pos in bounds:
        piece = text[start:b_pos]
        out.append(
            (start, b_pos - start, hashlib.md5(piece.encode()).hexdigest())
        )
        start = b_pos
    return out


def cdc_chunk_spans(
    docs: DataFrame,
    *,
    window: int = 8,
    min_len: int = 16,
    max_len: int = 128,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Explode each document into content-defined chunks.

    Returns (doc_id, source, chunk_idx, start, length, chunk_hash) —
    one row per chunk, boundaries per the module determinism contract.
    The rolling-hash scan is pure Python per document, so the input is
    fanned out to cluster parallelism first (grow-only — a corpus-scale
    input with many partitions is untouched; a small single-file scan
    would otherwise put the whole chunker on ONE task, measured 1-task
    stages at sf0.1). Beyond that it is a narrow map (mapInPandas);
    callers aggregate/join on ``chunk_hash``.
    """
    if min_len < window:
        # below the window the rolling hash is still warming up
        # (prefix hash, not a w-window hash); the contract keeps every
        # boundary check past that region.
        raise ValueError(f"min_len ({min_len}) must be >= window ({window})")
    w, mn, mx, dv = window, min_len, max_len, divisor
    src = (
        F.col(source_col) if source_col in docs.columns
        else F.lit(None)  # source is annotation, not an input contract
    )
    cols = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        src.cast("string").alias("source"),
        F.col(text_col).cast("string").alias("text"),
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                if text is None:
                    continue
                for idx, (start, length, digest) in enumerate(
                    _doc_chunks_numpy(text, w, mn, mx, dv)
                ):
                    rows.append(
                        (int(doc_id), source, idx, start, length, digest)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "source",
                    "chunk_idx",
                    "start",
                    "length",
                    "chunk_hash",
                ],
            )

    from flink_ms_spark.partitioning import FANOUT_KB_PER_TASK, fan_out

    return fan_out(cols, kb_per_task=FANOUT_KB_PER_TASK).mapInPandas(
        emit, CHUNK_SCHEMA
    )
