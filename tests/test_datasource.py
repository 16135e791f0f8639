"""flinkms_model Python DataSource: read/write parity with the
reference's model text formats (SURVEY.md §1.2) and with the
column-expression codec path (functions/codecs.py)."""

from __future__ import annotations

import os

import pytest

from flink_ms_spark.sources.datasource import register_model_datasource


@pytest.fixture()
def model_dir(tmp_path):
    """Nested model dump in the reference layout (one shard per
    subtask, nested dirs — ALSKafkaProducer's S4 source shape)."""
    root = tmp_path / "model"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_text("1,U,0.5;1.5;-2.0\n2,I,3.0;4.25;5.5\n")
    (root / "sub" / "b.txt").write_text("3,U,bad;1.0;2.0\nMEAN,U,1.0;1.0;1.0\n")
    return str(root)


def test_als_read_nested_quarantine_and_key(spark, model_dir):
    register_model_datasource(spark)
    df = spark.read.format("flinkms_model").load(model_dir)
    rows = {r.key: r for r in df.collect()}
    assert set(rows) == {"1-U", "2-I", "3-U", "MEAN-U"}
    assert rows["1-U"].factors == [0.5, 1.5, -2.0]
    # malformed element quarantined to NULL, row survives (M9 stance)
    assert rows["3-U"].factors == [None, 1.0, 2.0]
    # MEAN sentinel rows keep their identity (id is STRING)
    assert rows["MEAN-U"].id == "MEAN"
    # one partition per file — the parallel-restore contract
    assert df.rdd.getNumPartitions() == 2


def test_als_read_matches_codec_parse_path(spark, model_dir):
    from flink_ms_spark.functions.codecs import parse_model_line
    from flink_ms_spark.sources.text import read_recursive_text

    register_model_datasource(spark)
    via_ds = spark.read.format("flinkms_model").load(model_dir)
    via_codec = read_recursive_text(spark, model_dir).select(
        *parse_model_line("value")
    )
    assert sorted(map(str, via_ds.collect())) == sorted(
        map(str, via_codec.collect())
    )


def test_als_write_round_trip_and_overwrite(spark, tmp_path):
    register_model_datasource(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("7-U", "7", "U", [1.0, 2.5]), ("MEAN-U", "MEAN", "U", [0.25, -1.0])],
        "key STRING, id STRING, kind STRING, factors ARRAY<DOUBLE>",
    )
    df.write.format("flinkms_model").mode("append").save(out)
    back = spark.read.format("flinkms_model").load(out)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))
    # text on disk is the reference encoding (Java Double.toString shape)
    texts = sorted(
        line
        for f in os.listdir(out)
        for line in open(os.path.join(out, f)).read().splitlines()
    )
    assert texts == ["7,U,1.0;2.5", "MEAN,U,0.25;-1.0"]

    # overwrite clears prior shards (K1 WriteMode.OVERWRITE)
    df2 = df.limit(1)
    df2.write.format("flinkms_model").mode("overwrite").save(out)
    assert spark.read.format("flinkms_model").load(out).count() == 1


def test_svm_kind(spark, tmp_path):
    register_model_datasource(spark)
    d = tmp_path / "svm"
    d.mkdir()
    (d / "w.txt").write_text("1,0.5\n2,-0.25\nbad,zzz\n")
    df = spark.read.format("flinkms_model").option("kind", "svm").load(str(d))
    rows = sorted([tuple(r) for r in df.collect()], key=str)
    assert (1, 0.5) in rows and (2, -0.25) in rows
    assert (None, None) in rows  # quarantined, not dropped


def test_streaming_monitored_dir_source(spark, tmp_path):
    """S5 as a first-class readStream format: each availableNow run
    emits exactly the files that appeared since the checkpointed
    offset — the reference's PROCESS_CONTINUOUSLY enumerator."""
    register_model_datasource(spark)
    src = tmp_path / "stream_model"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_ds")
    (src / "a.txt").write_text("1,U,0.5;1.5\n2,I,3.0;4.0\n")

    got: list = []

    def run() -> None:
        stream = spark.readStream.format("flinkms_model").load(str(src))
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _bid: got.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(r.key for r in got) == ["1-U", "2-I"]
    assert [f for f in got if f.key == "1-U"][0].factors == [0.5, 1.5]

    # second file arrives: only ITS rows are emitted on the next run
    got.clear()
    (src / "b.txt").write_text("MEAN,U,1.0;1.0\n")
    run()
    assert [r.key for r in got] == ["MEAN-U"]

    # nothing new: empty batch, no re-emission
    got.clear()
    run()
    assert got == []


def test_model_writer_commit_fails_loud_on_missing_temp(spark, tmp_path):
    """A commit message naming a temp file the driver cannot see must
    raise, not silently drop that task's rows (the no-shared-mount
    cluster misconfiguration)."""
    import pytest

    from flink_ms_spark.sources.datasource import ModelFileWriter, _FileCommit

    w = ModelFileWriter({"path": str(tmp_path / "out")}, overwrite=True)
    gone = str(tmp_path / "out" / "_tmp-part-deadbeef.txt")
    with pytest.raises(IOError, match="shared"):
        w.commit([_FileCommit(gone)])
