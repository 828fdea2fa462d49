"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only "state machines" are its in-process line loops
(DDL accumulator ``log2sql.py:77-92``, event segmenter ``log2sql.py:97-99``).
The engine-level generalization: arbitrary keyed state that survives
across micro-batches, Arrow-batched per group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)
_STATE_SCHEMA = "events_seen LONG, total_value_cents LONG"


def _update_running_totals(
    key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + value (in exact cents) across
    micro-batches; emit the updated running total once per batch."""
    (user_id,) = key
    seen, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        seen += len(pdf)
        cents += int(round(pdf["value"].fillna(0.0).mul(100).round()).sum())
    state.update((seen, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "events_seen": [seen], "total_value_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user lifetime totals, updated each
    micro-batch. Works on a streaming events-shaped input."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTAL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
