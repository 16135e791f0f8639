"""StreamingChunkDedup: cross-batch content rejection, edit
robustness, within-batch copies, and replay idempotence."""

from __future__ import annotations

import hashlib


def _text(n: int, seed: str) -> str:
    out = []
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.extend(chr(ord("a") + int(c, 16) % 26) for c in h)
        i += 1
    return "".join(out[:n])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_stream_chunk_dedup_end_to_end(spark, tmp_path):
    from flink_ms_spark.streaming.chunk_dedup import StreamingChunkDedup

    sd = StreamingChunkDedup(str(tmp_path / "reg"), max_dup_ratio=0.5)

    a, b = _text(600, "A"), _text(600, "B")
    out1 = sd.process_batch(_docs(spark, [(1, a), (2, b)]), batch_id=0)
    assert _ids(out1) == [1, 2]

    # batch 2: doc 3 is doc A with a small edit (chunk-level dup of the
    # corpus despite no exact match), doc 4 is fresh
    edited_a = a[:40] + "XYZ" + a[40:]
    fresh = _text(600, "D")
    out2 = sd.process_batch(_docs(spark, [(3, edited_a), (4, fresh)]), batch_id=1)
    assert _ids(out2) == [4], "near-copy must be rejected, fresh admitted"

    # replay batch 2 (task retry): identical verdicts, registry stays
    # consistent (doc 4 does not self-collide with its own rows)
    out2r = sd.process_batch(_docs(spark, [(3, edited_a), (4, fresh)]), batch_id=1)
    assert _ids(out2r) == [4]


def test_within_batch_copies_keep_min_id_and_replay_stable(spark, tmp_path):
    from flink_ms_spark.streaming.chunk_dedup import StreamingChunkDedup

    sd = StreamingChunkDedup(str(tmp_path / "reg"), max_dup_ratio=0.5)
    x = _text(600, "X")
    batch = _docs(spark, [(10, x), (11, x), (12, _text(600, "Z"))])
    first = sd.process_batch(batch, batch_id=0)
    assert _ids(first) == [10, 12], "copy keeps the smallest doc_id"
    replay = sd.process_batch(batch, batch_id=0)
    assert _ids(replay) == [10, 12], "replay must not flip the verdict"


def test_streaming_run_writes_partitioned_survivors(spark, tmp_path):
    import json

    from flink_ms_spark.streaming.chunk_dedup import StreamingChunkDedup

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": _text(600, "A")},
        {"doc_id": 2, "text": _text(600, "A")},  # in-batch copy of 1
    ]
    with open(src / "b.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "out")
    sd = StreamingChunkDedup(str(tmp_path / "reg"), out_dir=out)
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(
        str(src)
    )
    q = sd.run(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    surv = spark.read.parquet(out)
    assert _ids(surv) == [1]
