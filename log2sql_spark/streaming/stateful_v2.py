"""Arbitrary stateful streaming on the Spark 4 `transformWithState`
API (StatefulProcessor): the successor of applyInPandasWithState with
explicit typed state handles and timer support.

Complements streaming/stateful.py (applyInPandasWithState): same keyed
running-aggregate semantics, new API surface — state is a named,
schema-typed ValueState the processor reads/updates per key, managed by
the state store (RocksDB/HDFS-backed on a cluster), so state size
scales with |keys|, never with the stream.

Environment gate: the transformWithState driver worker requires the
python ``protobuf`` package (absent in this container, installs
disallowed) and the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``). The operator and
its pytest are written against the real API and skip cleanly when the
dependency is missing — same honest gating as the pymysql sink
(streaming/apply_sink.py) and the PIL/ffmpeg codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (sum, count) over a value column: every incoming
    micro-batch folds into ValueState and emits the key's new totals."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "total double, n bigint")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._totals.exists():
            total, n = self._totals.get()
        else:
            total, n = 0.0, 0
        for pdf in rows:
            total += float(pdf["value"].sum())
            n += len(pdf)
        self._totals.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total": [round(total, 6)], "n": [n]}
        )

    def close(self) -> None:
        pass


OUTPUT_SCHEMA = "user_id bigint, total double, n bigint"


def running_totals_stream(events: DataFrame) -> DataFrame:
    """events(user_id, value) stream -> per-key running totals via
    transformWithStateInPandas in Update mode."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
