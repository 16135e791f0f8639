"""Text-format codecs for the reference record formats (SURVEY.md §2.3).

These keep byte-parity with the reference's string encodings at the
file/Kafka boundary; inside the engine everything is typed columns.
All are pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_factors(col: Column | str) -> Column:
    """T4 — ``f1;f2;...;fk`` string → ARRAY<DOUBLE>
    (reference ALSMeanVector.scala:28, SGD.java:175-179).

    ``try_cast``: malformed elements become NULL instead of failing the
    job (ANSI mode is on; at 100 TB one bad record must not kill a scan —
    the reference would throw NumberFormatException, we quarantine).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, ";"), lambda x: x.try_cast("double"))


def parse_model_line(line: Column | str) -> list[Column]:
    """T2 — ALS model line ``id,{U|I},f1;f2;...`` → (key, id, kind, factors)
    with composite state key ``id-KIND`` (reference ALSKafkaConsumer.java:75-82)."""
    c = F.col(line) if isinstance(line, str) else line
    parts = F.split(c, ",")
    return [
        F.concat_ws("-", parts.getItem(0), parts.getItem(1)).alias("key"),
        parts.getItem(0).alias("id"),
        parts.getItem(1).alias("kind"),
        parse_factors(parts.getItem(2)).alias("factors"),
    ]


def parse_svm_model_line(line: Column | str) -> list[Column]:
    """T3 — SVM model line ``featureId,weight`` → typed columns
    (reference SVMKafkaConsumer.java:76-82)."""
    c = F.col(line) if isinstance(line, str) else line
    parts = F.split(c, ",")
    return [
        parts.getItem(0).try_cast("int").alias("feature_id"),
        parts.getItem(1).try_cast("double").alias("weight"),
    ]


def format_model_row(id_col: Column | str, kind: Column | str, factors: Column | str) -> Column:
    """T5 — (id, kind, factors) → ``id,KIND,f1;f2;...`` text row
    (reference ALSImpl.scala:83-85 OutputFactor.toString)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    k = F.col(kind) if isinstance(kind, str) else kind
    f = F.col(factors) if isinstance(factors, str) else factors
    return F.concat_ws(",", i, k, F.array_join(f, ";"))


def model_key(id_col: Column | str, kind: Column | str) -> Column:
    """State key ``{id}-{U|I}`` (reference ALSKafkaConsumer.java:79)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    k = F.col(kind) if isinstance(kind, str) else kind
    return F.concat_ws("-", i, k)


def bucket_of(feature_id: Column | str, range_size: int = 1000) -> Column:
    """T8 — range-partition bucket ``feature_id / range`` (Java int
    division; ids >= 1 so floor == int-div) (reference SVMImpl.scala:42)."""
    c = F.col(feature_id) if isinstance(feature_id, str) else feature_id
    return F.floor(c / F.lit(range_size)).cast("int")


def normalize_query(col: Column | str) -> Column:
    """T9 — ``upper(trim(x))`` query normalization (reference ALSPredict.java:61)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))
