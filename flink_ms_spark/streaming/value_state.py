"""Engine-managed queryable-state analog via ``transformWithStateInPandas``
(SURVEY.md §2.6 X1 — the closest Spark 4.x construct to Flink's
queryable ValueState).

The ``foreachBatch`` ModelStore (streaming/loader.py) keeps the
latest-per-key view application-side; this module keeps it in the
STREAMING ENGINE's keyed state store (checkpointed, RocksDB-capable,
restored on restart) exactly like the reference's
``keyBy(0).asQueryableState(...)`` (ALSKafkaConsumer.java:84-92):

- state: one ValueState per key holding the latest payload;
- emission: every input batch emits the keys it touched with their
  new latest value — a *changelog* of the state, which downstream
  ``foreachBatch`` can mirror into a point-lookup dict (Flink's
  network-queryable side of the state has no Spark equivalent; the
  changelog mirror is the documented substitute, SURVEY.md §7).

Runtime requirements: the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and a working
``google.protobuf`` install (the TWS driver worker speaks protobuf to
the JVM). In environments without protobuf there are TWO working
substitutes: the engine-managed ``applyInPandasWithState`` operators
in streaming/group_state.py (keyed GroupState, checkpointed and
restart-recovered — the tested ValueState parity path), and the
``foreachBatch`` ModelStore (streaming/loader.py) for the
application-side point-lookup view.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StringType, StructField, StructType

STATE_SCHEMA = StructType([StructField("payload", StringType(), True)])
OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("payload", StringType(), True),
    ]
)


class LatestPerKeyProcessor(StatefulProcessor):
    """ValueState upsert: keep the last payload per key (within a batch,
    by ``ord`` — source offset order, the reference's per-key arrival
    order), emit the key's new state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("latest", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        last_ord, last_payload = -1, None
        for pdf in rows:
            top = pdf.sort_values("ord").iloc[-1]
            if top["ord"] > last_ord:
                last_ord, last_payload = top["ord"], top["payload"]
        if last_payload is not None:
            self._state.update((last_payload,))
        else:
            # the winning row carried a NULL payload: emit what the
            # state RETAINS, never (key, None) — a changelog mirror
            # replaying the emission would otherwise overwrite the key
            # to None while the checkpointed state keeps the old value,
            # and the two views diverge permanently after restart
            existing = self._state.get()
            last_payload = existing[0] if existing is not None else None
        yield pd.DataFrame({"key": [key[0]], "payload": [last_payload]})

    def close(self) -> None:
        pass


def latest_per_key_state(stream: DataFrame) -> DataFrame:
    """(key STRING, ord LONG, payload STRING) stream → changelog of the
    engine-managed latest-per-key ValueState."""
    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=LatestPerKeyProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
