#!/usr/bin/env python
"""Round-15 kernel-family scaling spot-check (VERDICT r14 item 7).

At sf0.1 the bench queries are 1-2 s walls dominated by fixed per-job
cost, so their 8-vs-32-core ratios sit near 1 and a serialized-kernel
regression would hide inside the overhead. This script measures the
Python-kernel FAMILIES on a synthetic input large enough that work
dominates (sf0.1 documents replicated --scale times with shifted ids;
deterministic, built fresh in a temp dir per run, measurement-only —
nothing on the bench or oracle path reads it).

Run twice (the driver pattern): SPARK_GRAFT_CPUS=32 and =8, same
--scale, and compare per-kernel walls. A healthy data-parallel kernel
shows a ratio well above 1 (ideal 4x); a ratio near 1 at this input
size means the kernel has lost its parallelism.

Usage: SPARK_GRAFT_CPUS=32 python scripts/scaling_spotcheck_r15.py [--scale 64]
Prints one JSON line: {"cpus": N, "scale": S, "kernels": {name: min_wall_s}}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from flink_ms_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=64)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("r15-scaling-spotcheck")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    tmp = tempfile.mkdtemp(prefix="r15-scaling-")
    try:
        docs0 = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        n0 = docs0.count()
        copies = spark.range(args.scale).withColumnRenamed("id", "_copy")
        scaled = docs0.crossJoin(copies).select(
            (F.col("doc_id") + F.col("_copy") * (n0 + 1)).alias("doc_id"),
            # append the copy index so scaled docs are not byte-identical
            # (keeps any dedup-ish kernel honest; cost per byte unchanged)
            F.concat_ws(" ", "text", F.col("_copy").cast("string")).alias("text"),
        )
        docs_path = os.path.join(tmp, "documents.parquet")
        scaled.repartition(max(cpus * 2, 16)).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path)

        emb0 = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        e0 = emb0.count()
        scaled_emb = emb0.crossJoin(copies).select(
            (F.col("vec_id") + F.col("_copy") * (e0 + 1)).alias("vec_id"),
            "embedding",
        )
        emb_path = os.path.join(tmp, "embeddings.parquet")
        scaled_emb.repartition(max(cpus * 2, 16)).write.parquet(emb_path)
        emb = spark.read.parquet(emb_path)

        # lev pairs: zip each doc with its +1 neighbor (near-equal
        # lengths, constant per-pair DP cost; |pairs| = |docs| - copies)
        pairs_path = os.path.join(tmp, "levpairs.parquet")
        da = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("_ta"))
        db = docs.select((F.col("doc_id") - 1).alias("a"), F.col("text").alias("_tb"))
        da.join(db, "a").select(
            "a", (F.col("a") + 1).alias("b"), "_ta", "_tb",
            F.greatest(F.length("_ta"), F.length("_tb")).alias("mx"),
        ).repartition(max(cpus * 2, 16)).write.parquet(pairs_path)
        levpairs = spark.read.parquet(pairs_path)

        # worker fleet pre-warm (same as bench.py)
        def _noop(it):
            for b in it:
                yield b

        spark.range(0, cpus * 4, 1, cpus).mapInPandas(_noop, "id long").write.format(
            "noop"
        ).mode("overwrite").save()

        from flink_ms_spark.functions.editdist import lev_pairs
        from flink_ms_spark.operators.chunking import cdc_chunk_spans
        from flink_ms_spark.operators.dedup import (
            minhash_signatures,
            shingle_sets,
            simhash,
        )
        from flink_ms_spark.operators.multimodal import (
            synthesize_video_media,
            video_fingerprints,
        )

        def lev_kernel_df():
            import pandas as pd

            def kern(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    lev = lev_pairs(pdf["_ta"].tolist(), pdf["_tb"].tolist())
                    yield pd.DataFrame(
                        {"a": pdf.a, "b": pdf.b, "lev": lev, "mx": pdf.mx}
                    )

            return levpairs.mapInPandas(kern, "a long, b long, lev long, mx int")

        kernels = {
            "minhash_signatures": lambda: minhash_signatures(
                docs, num_hashes=4, shingle_n=3
            ),
            "shingle_sets": lambda: shingle_sets(docs, 5),
            "simhash": lambda: simhash(docs, bits=32),
            "cdc_chunk_spans": lambda: cdc_chunk_spans(docs),
            "myers_lev": lev_kernel_df,
            "video_fingerprints": lambda: video_fingerprints(
                synthesize_video_media(docs, group_size=3)
            ),
        }

        out = {}
        for name, fn in kernels.items():
            spark.sparkContext.setJobDescription(f"r15-scaling: {name}")
            _force(fn())  # untimed warm-up (codegen/JIT)
            walls = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _force(fn())
                walls.append(time.perf_counter() - t0)
            out[name] = round(min(walls), 2)
        print(
            json.dumps(
                {"cpus": cpus, "scale": args.scale, "kernels": out}
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
