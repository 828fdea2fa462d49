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
(``spark.sql.streaming.stateStore.providerClass``). When protobuf is
missing, :func:`running_totals_stream` transparently falls back to an
``applyInPandasWithState`` twin with identical output schema and
semantics — so the operator (and its pytest) run everywhere, and the
new-API path engages automatically where the dependency exists.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType


def has_protobuf() -> bool:
    """True iff the python protobuf package (transformWithState's wire
    dependency) is importable in this environment."""
    try:  # find_spec raises if the parent 'google' package is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


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
    transformWithStateInPandas (append mode); identical-semantics
    applyInPandasWithState fallback when protobuf is absent."""
    if has_protobuf():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            # Append: emitted totals rows are final for their batch, so
            # the operator composes with append-only sinks (parquet).
            outputMode="Append",
            timeMode="None",
        )
    return _running_totals_fallback(events)


def _running_totals_fallback(events: DataFrame) -> DataFrame:
    """The same per-key (total, n) ValueState semantics on the v1
    applyInPandasWithState API: state is the 16-byte (total, n) pair
    per key, one emitted row per key per micro-batch."""
    from typing import Iterator

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdf_iter:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total": [round(total, 6)], "n": [n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="total double, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
