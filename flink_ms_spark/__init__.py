"""flink_ms_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference system mmziyad/flink-ms
(batch ALS/SVM model training, streaming model serving with point lookups,
online SGD, MSE evaluation), re-expressed Spark-first, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that make the engine useful at 100 TB.

Architecture stance (see SURVEY.md §7):

- Everything is DataFrame-in / DataFrame-out; plans are declared with the
  DataFrame / Spark SQL API so Catalyst handles pushdown, pruning, join
  selection and whole-stage codegen.
- The reference's queryable-state KV "model table" becomes a ModelStore:
  a latest-per-key DataFrame view (join-able, broadcast-able) paired with
  a driver-side dict for sub-millisecond point lookups.
- The reference's per-record state RPCs (SGD enrichment, MSE scoring)
  become stream-static / batch joins — the hash join probes each key once
  from a built table, which is exactly the memoization the reference
  hand-rolls (reference MSE.java:47-49).
- Python UDFs are avoided in hot paths; where Python is unavoidable
  (multimodal decode) we use Arrow-batched pandas iterators.
"""

__version__ = "0.1.0"

from flink_ms_spark.session import get_spark  # noqa: F401
