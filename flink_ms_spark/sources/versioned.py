"""Versioned corpus snapshots — poor-man's time travel without a
table format dependency (no Delta/Iceberg in this container).

Layout::

    <root>/v=<N>/...parquet     immutable snapshot data
    <root>/_versions.json       manifest: latest + per-version rows

Writes are snapshot-isolated the cheap way: data lands in a NEW
``v=<N>`` directory first, and the manifest file is replaced last
(write-tmp → rename through the Hadoop FileSystem — atomic on HDFS
renames, best-available on object stores, os.replace-equivalent on
local paths) — a reader that loaded the old manifest keeps reading
the old snapshot's directory untouched. That ordering (data fully
written → manifest flip) is the entire correctness argument, the same
one table formats make with their commit log; what this deliberately
does NOT provide is concurrent multi-writer commits (a real log
arbitrates those). All manifest/listing IO goes through fsutil so a
corpus root on shared storage (where a 100 TB corpus actually lives)
behaves exactly like the local fixture root.

The diff is digest-based: a document changed iff its normalized-text
md5 changed — the same digest the dedup family keys on, so "changed
since v3" composes directly with incremental dedup/reprocessing (only
added ∪ changed docs need re-scoring at 100 TB).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_ms_spark import fsutil
from flink_ms_spark.operators.text import normalize_text

_MANIFEST = "_versions.json"


def _read_manifest(spark: SparkSession, root: str) -> dict:
    p = fsutil.join(root, _MANIFEST)
    if not fsutil.exists(spark, p):
        return {"latest": 0, "versions": {}}
    return json.loads(fsutil.read_text(spark, p))


def write_version(df: DataFrame, root: str, id_col: str = "doc_id") -> int:
    """Write the next snapshot; returns the new version number.
    Data first, manifest flip last (write-tmp → rename).

    Torn-write recovery: a crash after the data write but before the
    manifest flip leaves an orphan ``v=N`` dir that is in no reader's
    view (the manifest still says N−1). Version allocation skips past
    any such orphan dirs — never reusing their numbers — so a torn
    write is self-healing instead of failing ``errorifexists`` forever.
    """
    spark = df.sparkSession
    man = _read_manifest(spark, root)
    v = int(man["latest"]) + 1
    orphans = [
        int(d[2:])
        for d in fsutil.list_names(spark, root, dirs_only=True)
        if d.startswith("v=") and d[2:].isdigit()
    ]
    if orphans:
        v = max(v, max(orphans) + 1)
    path = fsutil.join(root, f"v={v}")
    df.write.mode("errorifexists").parquet(path)
    n = spark.read.parquet(path).count()
    man["latest"] = v
    man["versions"][str(v)] = {"rows": n}
    fsutil.replace_text(
        spark,
        fsutil.join(root, _MANIFEST),
        json.dumps(man, indent=2, sort_keys=True),
    )
    return v


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a specific snapshot (default: latest per the manifest)."""
    man = _read_manifest(spark, root)
    v = int(man["latest"]) if version is None else int(version)
    if v < 1 or str(v) not in man["versions"]:
        raise ValueError(f"version {v} not in manifest (latest {man['latest']})")
    return spark.read.parquet(fsutil.join(root, f"v={v}"))


def corpus_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(change STRING, doc_id): 'added' | 'removed' | 'changed' rows
    between two snapshots; unchanged docs are absent. One full-outer
    join on the id with digest comparison — the incremental-processing
    primitive (downstream jobs reprocess added ∪ changed only).
    """
    def keyed(v: int, side: str) -> DataFrame:
        # presence comes from an explicit marker, NOT digest nullness:
        # md5(normalize(NULL text)) is NULL, so a null-text doc present
        # in both versions would otherwise classify as 'added' (and a
        # removed one as 'added' too), duplicating rows downstream in
        # incremental_rescore
        return read_version(spark, root, v).select(
            F.col(id_col).alias("doc_id"),
            F.md5(normalize_text(text_col)).alias(f"d_{side}"),
            F.lit(1).alias(f"in_{side}"),
        )

    o = keyed(v_old, "old")
    n = keyed(v_new, "new")
    j = o.join(n, "doc_id", "full_outer")
    return (
        j.select(
            "doc_id",
            F.when(F.col("in_old").isNull(), "added")
            .when(F.col("in_new").isNull(), "removed")
            .when(
                ~F.col("d_old").eqNullSafe(F.col("d_new")), "changed"
            )
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
        .select("change", "doc_id")
    )
