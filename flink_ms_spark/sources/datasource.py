"""Custom Python DataSource for the reference's model text formats.

``spark.read.format("flinkms_model")`` packages the reference's
file-format surface (SURVEY.md §1.2) as a first-class Spark source —
the DataSource V2 Python API (Spark 4.x) instead of read-text-then-
parse. Formats:

- ``kind=als`` (default): ``id,{U|I},f1;f2;...;fk`` rows
  (reference ALSImpl.scala:83-85 writer, ALSKafkaConsumer.java:77-81
  parser) → ``key STRING, id STRING, kind STRING, factors
  ARRAY<DOUBLE>`` — the same shape as functions/codecs.py
  parse_model_line (T2), composite state key included; id stays STRING
  because real model streams carry the ``MEAN`` sentinel rows
  (ALSMeanVector.scala:35).
- ``kind=svm``: ``featureId,weight`` rows (SVMImpl.scala:45,
  SVMKafkaConsumer.java:76-82) → ``feature_id INT, weight DOUBLE``.

Scale model: one InputPartition per file (a directory of N model
shards scans with N-way parallelism; the reference writes one shard
per Flink subtask, so real model dirs ARE multi-file). Malformed
numeric fields become NULL, mirroring the try_cast quarantine
semantics of functions/codecs.py — one bad record must not kill a
100 TB restore. The writer emits the same text format (K1 overwrite
semantics handled by Spark's mode), one file per input partition.

This is plumbing parity, not the hot path — bulk reads of *our* model
tables stay parquet; this source exists so a user can point the engine
at the reference's existing model dumps without a conversion step.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

_SCHEMAS = {
    "als": "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    "svm": "feature_id INT, weight DOUBLE",
}


def _try_float(s: str) -> float | None:
    try:
        return float(s)
    except ValueError:
        return None


def _try_int(s: str) -> int | None:
    try:
        return int(s)
    except ValueError:
        return None


def _list_files(root: str) -> list[str]:
    """Recursive enumeration (the reference's nested-file source, S4:
    ALSKafkaProducer.java:24-26 setNestedFileEnumeration)."""
    if os.path.isfile(root):
        return [root]
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ModelFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flinkms_model: .load(path) is required")
        self.kind = options.get("kind", "als")

    def partitions(self):
        files = _list_files(self.path)
        # empty dir still needs one partition (yields nothing)
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                # one shared parser for batch AND stream reads — a
                # divergent inline copy here once risked the two paths
                # drifting on format tweaks
                yield _parse_line(line, self.kind)


class _FileCommit(WriterCommitMessage):
    """Carries the task's temp-file path to the driver-side commit."""

    def __init__(self, tmp_path: str | None):
        self.tmp_path = tmp_path


class ModelFileWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flinkms_model: .save(path) is required")
        self.kind = options.get("kind", "als")
        self.overwrite = overwrite

    def write(self, rows: Iterator[Row]) -> "_FileCommit":
        os.makedirs(self.path, exist_ok=True)
        # task-temp file, promoted to its final name only in the
        # driver-side commit(): a failed/speculative attempt leaves a
        # _tmp- file that abort()/the next overwrite clears, never a
        # half-written part- file that a reader would ingest
        final = f"part-{uuid.uuid4().hex}.txt"
        tmp = os.path.join(self.path, f"_tmp-{final}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for r in rows:
                if self.kind == "svm":
                    if r["feature_id"] is None or r["weight"] is None:
                        continue  # malformed-read residue: unserializable
                    fh.write(f"{r['feature_id']},{r['weight']}\n")
                else:
                    facs_raw = r["factors"]
                    if (
                        r["id"] is None
                        or r["kind"] is None
                        or facs_raw is None
                        or any(f is None for f in facs_raw)
                    ):
                        # rows the READER yields for malformed lines
                        # (null id/factors) have no text form; writing
                        # them would emit 'None' literals the
                        # reference's Double.parseDouble chokes on
                        continue
                    # repr() output is parseable by the reference's
                    # consumers (InputFactor-style split on ';').
                    # NOT byte-identical to Java Double.toString for
                    # exponent forms (repr(1e-07)='1e-07' vs '1.0E-7');
                    # round-trip parity is what the tests pin.
                    facs = ";".join(repr(f) for f in facs_raw)
                    fh.write(f"{r['id']},{r['kind']},{facs}\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _FileCommit(None)
        return _FileCommit(tmp)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None or not m.tmp_path:
                continue
            if not os.path.exists(m.tmp_path):
                # the task reported rows written; a missing temp file
                # means the executor's filesystem is not the driver's
                # (this writer requires a SHARED mount on a cluster —
                # local path or NFS/fuse; plain executor-local disks
                # are invisible here). Silently skipping would commit
                # a write with rows missing — fail loud instead.
                raise IOError(
                    f"flinkms_model commit: task temp file {m.tmp_path} "
                    "not visible on the driver — the output path must be "
                    "on a filesystem shared by driver and executors"
                )
            base = os.path.basename(m.tmp_path)[len("_tmp-"):]
            os.replace(
                m.tmp_path, os.path.join(os.path.dirname(m.tmp_path), base)
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def _parse_line(line: str, kind: str) -> tuple:
    """One model line → schema tuple (shared by the batch and stream
    readers; malformed numerics become NULL, never exceptions)."""
    if kind == "svm":
        tok = line.split(",")
        if len(tok) < 2:
            return (None, None)
        return (_try_int(tok[0]), _try_float(tok[1]))
    tok = line.split(",", 2)
    rid = tok[0] if tok else None
    k = tok[1] if len(tok) > 1 else None
    facs = [_try_float(x) for x in tok[2].split(";")] if len(tok) > 2 else None
    key = f"{rid}-{k}" if rid is not None and k else None
    return (key, rid, k, facs)


class ModelFileStreamReader(SimpleDataSourceStreamReader):
    """Monitored-directory streaming for the model text formats — the
    reference's S5 FileProcessingMode.PROCESS_CONTINUOUSLY source
    (SGD.java:50-64) as a FIRST-CLASS ``readStream.format()`` source
    instead of read-text-then-parse.

    Offset = the sorted list of files already emitted; each batch
    reads exactly the files that appeared since. Replays are exact:
    ``readBetweenOffsets(start, end)`` re-reads ``end − start``, so a
    recovered query re-emits the identical batch (model shards are
    immutable once written — the same assumption the reference's
    enumerator makes). Driver-side reads are fine here by design:
    model files are model-scale, and the simple-reader API trades
    executor fan-out for exact replay bookkeeping."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flinkms_model: .load(path) is required")
        self.kind = options.get("kind", "als")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _read_files(self, files: list[str]) -> list[tuple]:
        rows: list[tuple] = []
        for p in files:
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        rows.append(_parse_line(line, self.kind))
        return rows

    def read(self, start: dict) -> tuple:
        now = _list_files(self.path)
        seen = set(start["seen"])  # build ONCE, not per listed file
        new = [p for p in now if p not in seen]
        end = {"seen": sorted(seen | set(now))}
        return iter(self._read_files(new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        replay = sorted(set(end["seen"]) - set(start["seen"]))
        return iter(self._read_files(replay))


class ModelFileDataSource(DataSource):
    """``spark.read.format("flinkms_model").option("kind", "als"|"svm")``
    — and the same format/options under ``spark.readStream`` for the
    monitored-directory streaming form."""

    @classmethod
    def name(cls) -> str:
        return "flinkms_model"

    def schema(self) -> str:
        return _SCHEMAS[self.options.get("kind", "als")]

    def reader(self, schema: StructType) -> ModelFileReader:
        return ModelFileReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> ModelFileStreamReader:
        return ModelFileStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ModelFileWriter:
        if overwrite:
            # K1 WriteMode.OVERWRITE parity: clear prior shards on the
            # driver before tasks fan out (same non-transactional window
            # the reference's file sink has).
            path = self.options.get("path")
            if path and os.path.isdir(path):
                for f in _list_files(path):
                    os.remove(f)
        return ModelFileWriter(self.options, overwrite)


def register_model_datasource(spark) -> None:
    """Idempotent registration on a (possibly driver-owned) session."""
    spark.dataSource.register(ModelFileDataSource)
