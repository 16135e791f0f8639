"""Codec round-trip tests (SURVEY.md §2.3 T1-T9, format parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ms_spark.functions.codecs import (
    bucket_of,
    format_model_row,
    model_key,
    normalize_query,
    parse_factors,
    parse_model_line,
    parse_svm_model_line,
)
from flink_ms_spark.sources.text import parse_rating_lines


def test_parse_rating_lines(spark):
    df = spark.createDataFrame([("7\t42\t3.5",), ("1\t2\t0.5",)], ["value"])
    rows = parse_rating_lines(df).collect()
    assert [(r.user_id, r.item_id, r.rating) for r in rows] == [(7, 42, 3.5), (1, 2, 0.5)]


def test_parse_model_line_and_key(spark):
    df = spark.createDataFrame([("17,U,1.5;2.0;-0.25",)], ["value"])
    row = df.select(*parse_model_line("value")).collect()[0]
    assert row.key == "17-U"
    assert row.id == "17"
    assert row.kind == "U"
    assert row.factors == [1.5, 2.0, -0.25]


def test_format_round_trip(spark):
    df = spark.createDataFrame([("17", "U", [1.5, 2.0, -0.25])], ["id", "kind", "factors"])
    line = df.select(format_model_row("id", "kind", "factors").alias("line")).collect()[0].line
    assert line == "17,U,1.5;2.0;-0.25"
    back = (
        spark.createDataFrame([(line,)], ["value"]).select(*parse_model_line("value")).collect()[0]
    )
    assert back.factors == [1.5, 2.0, -0.25]


def test_parse_svm_model_line(spark):
    df = spark.createDataFrame([("1001,-0.125",)], ["value"])
    row = df.select(*parse_svm_model_line("value")).collect()[0]
    assert (row.feature_id, row.weight) == (1001, -0.125)


def test_bucket_int_division(spark):
    # reference: Java int division featureId/range (SVMImpl.scala:42)
    df = spark.createDataFrame([(1,), (999,), (1000,), (1001,), (2000,)], ["feature_id"])
    got = [r[0] for r in df.select(bucket_of("feature_id", 1000)).collect()]
    assert got == [0, 0, 1, 1, 2]


def test_normalize_query(spark):
    df = spark.createDataFrame([("  7,42  ",)], ["value"])
    assert df.select(normalize_query("value").alias("q")).collect()[0].q == "7,42"


def test_parse_factors_null_safety(spark):
    df = spark.createDataFrame([("1.0;x;3.0",)], ["value"])
    row = df.select(parse_factors("value").alias("f")).collect()[0]
    assert row.f[0] == 1.0 and row.f[1] is None and row.f[2] == 3.0


def test_model_key_composite(spark):
    df = spark.createDataFrame([("MEAN", "I")], ["id", "kind"])
    assert df.select(model_key("id", "kind").alias("k")).collect()[0].k == "MEAN-I"
